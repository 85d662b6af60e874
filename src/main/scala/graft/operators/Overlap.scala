package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{KmvDistinct, PortableHash}

/** Sketch-composed set operations over audience segments — the q51/q52
  * KMV estimator generalized from "how many distinct" to "how much do two
  * segments OVERLAP", the theta-sketch composition (Dasgupta et al.,
  * "Theta-Sketch Framework") on the engine-portable hash basis.
  *
  * Why it scales: each segment reduces to a ≤ k-long sorted hash array
  * via the bounded-state [[KmvDistinct]] aggregation (map-side combine,
  * ≤ k longs per partition on the shuffle), and union/intersection happen
  * on the two ARRAYS in a single final task — the fact table is scanned
  * once, nothing user-level ever shuffles. The exact companion columns
  * (one groupBy(user) pass) are carried for error measurement and as the
  * small-SF oracle anchor; at 100 TB you would drop them and keep only
  * the sketch columns.
  *
  * Determinism: union bottom-k of two bottom-k sketches IS the union
  * sketch (min-wise stability); membership below theta is exact because
  * theta_union ≤ each segment's own theta. The estimate arithmetic is the
  * q51 convention — one double divide, one round, bit-identical in
  * DuckDB. */
object Overlap {
  /** q100: view-vs-purchase audience overlap on one row: exact distinct
    * users per segment and in both, KMV union estimate, and the
    * theta-composed intersection estimate round(common · union_est / k). */
  def audienceOverlap(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"),
        PortableHash.h60(col("user_id").cast("string")).as("h"))

    // exact companion: one user-keyed pass, then a 1-row reduce
    val exact = ev
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .agg(sum(col("v")).as("n_view"), sum(col("p")).as("n_buy"),
        sum(col("v") * col("p")).as("n_inter"))

    // per-segment bounded-state sketches: one row, two ≤ k arrays.
    // Segments aggregate over FILTERED frames (not a conditional input
    // column — a null input through the primitive-Long UDAF encoder
    // would coerce to hash 0 and poison the bottom-k).
    val sk = KmvDistinct.sketchAgg(k)
    val sa = ev.filter(col("event_type") === "view")
      .agg(sk(col("h")).as("sa"))
    val sb = ev.filter(col("event_type") === "purchase")
      .agg(sk(col("h")).as("sb"))

    exact.crossJoin(sa).crossJoin(sb)
      .withColumn("u",
        slice(array_sort(array_distinct(concat(col("sa"), col("sb")))), 1, k))
      .withColumn("nd", size(col("u")).cast("long"))
      // guard the k-th access: under capacity there IS no theta (ANSI
      // element_at throws on out-of-bounds, and rightly so)
      .withColumn("hk",
        when(col("nd") >= k, element_at(col("u"), k)))
      .withColumn("common",
        size(expr("filter(u, x -> array_contains(sa, x) AND " +
          "array_contains(sb, x))")).cast("long"))
      .withColumn("union_est",
        when(col("nd") < k, col("nd")).otherwise(
          expr(s"CAST(round(${k - 1}.0 * ${KmvDistinct.TwoPow60} / " +
            "CAST(hk AS DOUBLE)) AS BIGINT)")))
      .withColumn("inter_est",
        when(col("nd") < k, col("common")).otherwise(
          expr(s"CAST(round(common * union_est / $k.0) AS BIGINT)")))
      .select(col("n_view"), col("n_buy"), col("n_inter"),
        col("union_est"), col("inter_est"))
  }

  /** DuckDB oracle for [[audienceOverlap]] (k = 64). */
  def audienceOverlapSql(k: Int = 64): String = {
    val h = PortableHash.h60Sql("CAST(user_id AS VARCHAR)")
    s"""WITH e AS (SELECT user_id, event_type, $h AS h
       |  FROM events WHERE event_type IN ('view', 'purchase')),
       |ex AS (SELECT CAST(SUM(v) AS BIGINT) AS n_view,
       |    CAST(SUM(p) AS BIGINT) AS n_buy,
       |    CAST(SUM(v * p) AS BIGINT) AS n_inter
       |  FROM (SELECT user_id,
       |      MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
       |      MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
       |    FROM e GROUP BY 1)),
       |va AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT h FROM e WHERE event_type = 'view'))
       |  WHERE rn <= $k),
       |pa AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT h FROM e WHERE event_type = 'purchase'))
       |  WHERE rn <= $k),
       |u AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
       |    FROM (SELECT h FROM va UNION SELECT h FROM pa)) WHERE rn <= $k),
       |st AS (SELECT COUNT(*) AS nd,
       |    MAX(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM u)),
       |cm AS (SELECT CAST(COUNT(*) AS BIGINT) AS common FROM u
       |  WHERE h IN (SELECT h FROM va) AND h IN (SELECT h FROM pa)),
       |ue AS (SELECT nd, ${KmvDistinct.estimateSql(k)} AS union_est
       |  FROM st)
       |SELECT ex.n_view, ex.n_buy, ex.n_inter,
       |  CAST(ue.union_est AS BIGINT) AS union_est,
       |  CASE WHEN ue.nd < $k THEN cm.common
       |    ELSE CAST(round(cm.common * ue.union_est / $k.0) AS BIGINT)
       |  END AS inter_est
       |FROM ex, ue, cm""".stripMargin
  }
}
