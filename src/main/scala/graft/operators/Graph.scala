package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Co-occurrence graph analytics over the order/part bipartite relation —
  * market-basket association mining and triangle counting on the induced
  * part-part co-purchase graph. The reference's product stats stop at
  * per-sku counters (ProductStatsApp); these are the relationship-level
  * analyses a recommendation/affinity layer builds on the same facts.
  *
  * Scale design:
  *  - pair generation is a SELF-JOIN WITHIN the order key, so the blowup
  *    per order is C(items, 2) — bounded by basket size (≤ ~7 parts in
  *    this schema), never corpus-quadratic; the join shuffles on
  *    orderkey once and both sides reuse the same exchange;
  *  - all association scores are integer parts-per-million
  *    (`x * 1_000_000 div y`) — no float division to drift between
  *    engines, and the magnitudes stay far below Long overflow even at
  *    10^9 orders (pair_ct · N · 10^6 with basket-bounded pair_ct);
  *  - the triangle join runs on the SUPPORT-THRESHOLDED edge set
  *    (pair_ct ≥ 2 prunes ~97% of raw pairs at every measured SF), and
  *    edges are oriented p1 < p2 so each triangle is enumerated exactly
  *    once as a < b < c. The classic further step at extreme skew —
  *    re-orienting edges from low- to high-degree endpoints to bound
  *    wedge counts — is documented in [[triangleCounts]].
  */
object Graph {

  /** Distinct (orderkey, partkey) incidence — dedup first so multi-line
    * orders of the same part count once. */
  private def incidence(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()

  /** Support-thresholded co-purchase pairs: p1 < p2, ordered. */
  private[operators] def pairFrame(s: SparkSession, dir: String,
                                   minSupport: Long = 2L): DataFrame = {
    val dl = incidence(s, dir)
    dl.as("a").join(dl.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("pair_ct"))
      .filter(col("pair_ct") >= minSupport)
  }

  /** q98: market-basket association rules — for every part pair bought
    * together in ≥ 2 orders: joint support, per-item supports, confidence
    * P(p2|p1) and lift (joint / expected-under-independence), all in
    * integer ppm. Item supports join from a per-part count frame that is
    * dimension-sized (one row per part) and broadcast. */
  def basketPairs(s: SparkSession, dir: String): DataFrame = {
    val dl = incidence(s, dir)
    val itemCt = dl.groupBy(col("pk")).agg(count(lit(1)).as("ict"))
    val nOrders = dl.agg(countDistinct(col("ok")).as("n_orders"))
    pairFrame(s, dir)
      .join(broadcast(itemCt.withColumnRenamed("pk", "p1")
        .withColumnRenamed("ict", "ct1")), Seq("p1"))
      .join(broadcast(itemCt.withColumnRenamed("pk", "p2")
        .withColumnRenamed("ict", "ct2")), Seq("p2"))
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("pair_ct"), col("ct1"), col("ct2"),
        expr("pair_ct * 1000000 div ct1").as("conf_ppm"),
        expr("pair_ct * n_orders * 1000000 div (ct1 * ct2)").as("lift_ppm"))
      .orderBy(col("p1"), col("p2"))
  }

  /** DuckDB oracle for [[basketPairs]]. */
  val basketPairsSql: String =
    """WITH dl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem),
      |pairs AS (SELECT a.pk AS p1, b.pk AS p2,
      |    CAST(COUNT(*) AS BIGINT) AS pair_ct
      |  FROM dl a JOIN dl b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |ic AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS ict FROM dl
      |  GROUP BY 1),
      |n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM dl)
      |SELECT p1, p2, pair_ct, c1.ict AS ct1, c2.ict AS ct2,
      |  pair_ct * 1000000 // c1.ict AS conf_ppm,
      |  pair_ct * n_orders * 1000000 // (c1.ict * c2.ict) AS lift_ppm
      |FROM pairs
      |JOIN ic c1 ON c1.pk = p1
      |JOIN ic c2 ON c2.pk = p2
      |CROSS JOIN n
      |ORDER BY p1, p2""".stripMargin

  /** q99: per-part triangle participation on the thresholded co-purchase
    * graph — for each part, the number of part-triples {a,b,c} (all three
    * pairwise co-purchased in ≥ 2 orders) it belongs to. Triangle count
    * is THE clustering primitive (local clustering coefficient numerator,
    * community seeding).
    *
    * Enumeration: edges carry p1 < p2, so joining e1(a,b)⋈e2(b,c) on the
    * shared middle vertex yields each candidate wedge a < b < c once, and
    * the closing-edge hash join (a,c) confirms triangles with no dedup
    * pass. Wedge volume is Σ_b deg⁺(b)·deg⁻(b) over the THRESHOLDED
    * graph; under adversarial skew the standard fix is orienting edges
    * low-degree → high-degree (each triangle still counted exactly once
    * from its lowest-degree vertex), which this construction accommodates
    * by replacing the `<` orientation with a (degree, pk) order — kept
    * simple here because the support threshold already bounds degrees. */
  def triangleCounts(s: SparkSession, dir: String): DataFrame = {
    val edges = pairFrame(s, dir).select(col("p1"), col("p2"))
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.p2") === col("e2.p1"))
      .join(edges.as("e3"),
        col("e3.p1") === col("e1.p1") && col("e3.p2") === col("e2.p2"))
      .select(col("e1.p1").as("a"), col("e1.p2").as("b"),
        col("e2.p2").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("pk"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("tri_ct"))
      .orderBy(col("pk"))
  }

  /** DuckDB oracle for [[triangleCounts]]. */
  val triangleCountsSql: String =
    """WITH dl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem),
      |e AS (SELECT a.pk AS p1, b.pk AS p2
      |  FROM dl a JOIN dl b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |tri AS (SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
      |  FROM e e1
      |  JOIN e e2 ON e1.p2 = e2.p1
      |  JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
      |nodes AS (SELECT a AS pk FROM tri UNION ALL
      |  SELECT b FROM tri UNION ALL SELECT c FROM tri)
      |SELECT pk, CAST(COUNT(*) AS BIGINT) AS tri_ct
      |FROM nodes GROUP BY 1 ORDER BY 1""".stripMargin
}
