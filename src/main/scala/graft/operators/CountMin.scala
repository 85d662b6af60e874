package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{PortableHash, Text}

/** q136: Count-Min frequency sketch (Cormode & Muthukrishnan 2005) over
  * the corpus 3-gram stream — the FREQUENCY companion completing the
  * sketch family (KMV/HLL distinct, Misra-Gries heavy hitters, theta
  * overlap): point-queryable counts from d·w integers instead of an
  * n-gram-vocabulary-sized table, never underestimating (est ≥ exact by
  * construction, spec-asserted). The domain is positional 3-token
  * shingles (16 k distinct at sf0.01 — the synthetic corpus's WORD
  * vocabulary is only 31 strings, which no sketch width would collide),
  * the n-gram-frequency use the C4/RefinedWeb boilerplate rules need at
  * corpus scale.
  *
  * Construction: d=3 rows × w=256 counters; an item's row-i position is
  * the [[PortableHash]] slot-i rehash mod w, so the DuckDB oracle rebuilds
  * identical cells. Cell counts are plain SUM aggregates — order-free,
  * partial-aggregation friendly (each scan partition reduces to ≤ d·w
  * cells before the shuffle), and mergeable by ADDITION (two corpora's
  * sketches sum cell-wise) — the property that makes the sketch a
  * per-micro-batch/per-segment artifact at 100 TB where a vocabulary
  * count table needs a vocabulary-keyed shuffle.
  *
  * The declared query grades the sketch the q130/q132 way: the exact
  * top-20 grams (deterministic (count desc, gram) order) are point-
  * queried against the sketch, output = exact count, estimate, and
  * overestimate in ppm — a collision regression changes a hash-gated
  * row. The synthetic corpus draws words uniformly, so its 3-gram
  * distribution is FLAT and the audit shows the ε·N ≈ N/w error floor
  * (~90 on ~31 k occurrences) dominating the small exact counts — the
  * honest reading of a CMS on skewless data; on a real Zipfian corpus
  * the same floor sits far below the heavy hitters the sketch exists to
  * count, and the knob is w (floor ∝ 1/w). */
object CountMin {
  val D = 3
  val W = 256

  /** (i, pos, c) cell frame — ≤ D·W rows — from a token column frame. */
  def sketch(toks: DataFrame): DataFrame = {
    val h = PortableHash.h60(col("t")) % PortableHash.P
    val rows = (1 to D).map(i =>
      struct(lit(i).as("i"), (PortableHash.slotHash(i, h) % W).as("pos")))
    toks
      .select(explode(array(rows: _*)).as("r"))
      .groupBy(col("r.i").as("i"), col("r.pos").as("pos"))
      .agg(count(lit(1)).as("c"))
  }

  /** The declared audit query over document 3-gram occurrences. */
  def tokenFreqAudit(s: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val toks = Tables.load(s, dir, "documents")
      .select(Text.tokens(col("text")).as("toks"))
      .select(explode(Text.shinglesPositional(col("toks"), 3)).as("t"))
      .persist()
    val cells = sketch(toks)
    val exact = toks.groupBy(col("t")).agg(count(lit(1)).as("exact_ct"))
    val top = exact
      .orderBy(col("exact_ct").desc, col("t"))
      .limit(topK)
    val h = PortableHash.h60(col("t")) % PortableHash.P
    val probes = (1 to D).map(i =>
      struct(lit(i).as("i"), (PortableHash.slotHash(i, h) % W).as("pos")))
    val out = top
      .select(col("t"), col("exact_ct"), explode(array(probes: _*)).as("r"))
      .select(col("t"), col("exact_ct"), col("r.i").as("i"),
        col("r.pos").as("pos"))
      .join(broadcast(cells), Seq("i", "pos"))
      .groupBy(col("t").as("token"), col("exact_ct"))
      .agg(min(col("c")).as("est_ct"))
      .select(col("token"), col("exact_ct"), col("est_ct"),
        expr("(est_ct - exact_ct) * 1000000 div exact_ct").as("over_ppm"))
      .orderBy(col("exact_ct").desc, col("token"))
      // topK-row result: pin it eagerly so the shingle cache can be
      // released NOW instead of leaking for the session (the dupClusters
      // discipline — every audit run otherwise parks one executor-storage
      // table per invocation)
      .transform(PinExplain.pin)
    toks.unpersist(false)
    out
  }

  /** DuckDB oracle rebuilding the identical sketch and audit. */
  def tokenFreqAuditSql(topK: Int = 20): String = {
    val hSql = s"((${PortableHash.h60Sql("t")}) % ${PortableHash.P})"
    def posSql(i: Int) = s"((${PortableHash.slotHashSql(i, hSql)}) % $W)"
    val cellRows = (1 to D).map(i =>
      s"SELECT $i AS i, ${posSql(i)} AS pos FROM tok").mkString(
      "\n  UNION ALL ")
    val probeRows = (1 to D).map(i =>
      s"SELECT t, exact_ct, $i AS i, ${posSql(i)} AS pos FROM top")
      .mkString("\n  UNION ALL ")
    s"""WITH tok AS MATERIALIZED (SELECT unnest(
       |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |     for i in generate_series(1, len(t)-2)]) AS t
       |  FROM (SELECT [x for x in string_split_regex(lower(text),
       |      '[^a-z0-9]+') if len(x) > 0] AS t FROM documents)
       |  WHERE len(t) >= 3),
       |cells AS MATERIALIZED (SELECT i, pos, COUNT(*) AS c FROM (
       |  $cellRows) GROUP BY 1, 2),
       |exact AS MATERIALIZED (SELECT t, COUNT(*) AS exact_ct FROM tok
       |  GROUP BY 1),
       |top AS MATERIALIZED (SELECT t, exact_ct FROM exact
       |  ORDER BY exact_ct DESC, t LIMIT $topK),
       |probes AS ($probeRows),
       |est AS (SELECT p.t AS token, p.exact_ct, MIN(c.c) AS est_ct
       |  FROM probes p JOIN cells c ON c.i = p.i AND c.pos = p.pos
       |  GROUP BY 1, 2)
       |SELECT token, CAST(exact_ct AS BIGINT) AS exact_ct,
       |  CAST(est_ct AS BIGINT) AS est_ct,
       |  CAST((est_ct - exact_ct) * 1000000 // exact_ct AS BIGINT)
       |    AS over_ppm
       |FROM est ORDER BY exact_ct DESC, token""".stripMargin
  }

  /** Join-size sketch width — wider than the frequency sketch's W because
    * inner-product error grows with n_left·n_right/W (AMS bound), not
    * N/W. */
  val JW = 4096

  /** q143: sketch-based join-size estimation (the count-min inner product,
    * Alon-Matias-Szegedy '96 / Cormode-Muthukrishnan '05 §4.2) — the
    * cardinality statistic a cost-based optimizer needs BEFORE running a
    * join: |A ⋈_k B| = Σ_k c_A(k)·c_B(k), estimated from two d×w sketches
    * as min_d Σ_w cmA[d][w]·cmB[d][w], never underestimating (collisions
    * only ADD cross terms). Here: views ⋈ purchases on user_id — the
    * many-to-many fan-out case where a mis-planned join explodes (q106's
    * audit measures the blowup after the fact; this predicts it from two
    * scans that never meet in a shuffle).
    *
    * Scale design: each side reduces to ≤ d·w cells via partial-agg SUMs
    * (order-free, mergeable by addition — per-segment sketches sum
    * cell-wise, so the estimate updates incrementally as segments land);
    * the inner product joins two metadata-sized cell frames. The exact
    * companion (one per-key count join) is carried for the audit columns.
    * Cell products fit Long comfortably here (≤ (n/w)²·w ≈ n²/w); the
    * DECIMAL(38,0) widening applies past n ≈ 10^11 rows per side at this
    * width (the q105 convention). */
  def joinSizeEstimate(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    def keyed(t: String) = ev.filter(col("event_type") === lit(t))
      .select((PortableHash.h60(col("user_id").cast("string")) %
        PortableHash.P).as("h"), col("user_id"))
    def cells(df: DataFrame) = {
      val rows = (1 to D).map(i =>
        struct(lit(i).as("i"), (PortableHash.slotHash(i, col("h")) % JW)
          .as("pos")))
      df.select(explode(array(rows: _*)).as("r"))
        .groupBy(col("r.i").as("i"), col("r.pos").as("pos"))
        .agg(count(lit(1)).as("c"))
    }
    val left = keyed("view")
    val right = keyed("purchase")
    val est = cells(left).as("a")
      .join(cells(right).as("b"),
        col("a.i") === col("b.i") && col("a.pos") === col("b.pos"))
      .groupBy(col("a.i").as("i"))
      .agg(sum(col("a.c") * col("b.c")).as("ip"))
      .agg(min(col("ip")).as("est_rows"),
        sum(when(col("i") === 1, col("ip"))).as("est_d1"),
        sum(when(col("i") === 2, col("ip"))).as("est_d2"),
        sum(when(col("i") === 3, col("ip"))).as("est_d3"))
    val exact = left.groupBy(col("user_id")).agg(count(lit(1)).as("ca"))
      .join(right.groupBy(col("user_id")).agg(count(lit(1)).as("cb")),
        Seq("user_id"))
      .agg(sum(col("ca") * col("cb")).as("exact_rows"))
    val sides = left.agg(count(lit(1)).as("n_left"))
      .crossJoin(right.agg(count(lit(1)).as("n_right")))
    sides.crossJoin(broadcast(exact)).crossJoin(broadcast(est))
      .select(col("n_left"), col("n_right"), col("exact_rows"),
        col("est_d1"), col("est_d2"), col("est_d3"), col("est_rows"),
        expr("(est_rows - exact_rows) * 1000000 div exact_rows")
          .as("over_ppm"))
  }

  /** DuckDB oracle rebuilding both sketches and the inner product. */
  def joinSizeEstimateSql: String = {
    val hSql = s"((${PortableHash.h60Sql("CAST(user_id AS VARCHAR)")}) % " +
      s"${PortableHash.P})"
    def posSql(i: Int) = s"((${PortableHash.slotHashSql(i, "h")}) % $JW)"
    def cellSql(src: String) = (1 to D).map(i =>
      s"SELECT $i AS i, ${posSql(i)} AS pos FROM $src").mkString(
      "\n    UNION ALL ")
    s"""WITH lv AS MATERIALIZED (SELECT $hSql AS h, user_id FROM events
       |  WHERE event_type = 'view'),
       |pu AS MATERIALIZED (SELECT $hSql AS h, user_id FROM events
       |  WHERE event_type = 'purchase'),
       |ca AS (SELECT i, pos, COUNT(*) AS c FROM (
       |    ${cellSql("lv")}) GROUP BY 1, 2),
       |cb AS (SELECT i, pos, COUNT(*) AS c FROM (
       |    ${cellSql("pu")}) GROUP BY 1, 2),
       |ip AS (SELECT a.i, SUM(a.c * b.c) AS ip FROM ca a
       |  JOIN cb b ON a.i = b.i AND a.pos = b.pos GROUP BY 1),
       |est AS (SELECT MIN(ip) AS est_rows,
       |  SUM(CASE WHEN i = 1 THEN ip END) AS est_d1,
       |  SUM(CASE WHEN i = 2 THEN ip END) AS est_d2,
       |  SUM(CASE WHEN i = 3 THEN ip END) AS est_d3 FROM ip),
       |ex AS (SELECT SUM(ca * cb) AS exact_rows FROM
       |  (SELECT user_id, COUNT(*) AS ca FROM lv GROUP BY 1) a
       |  JOIN (SELECT user_id, COUNT(*) AS cb FROM pu GROUP BY 1) b
       |  USING (user_id)),
       |n AS (SELECT (SELECT COUNT(*) FROM lv) AS n_left,
       |  (SELECT COUNT(*) FROM pu) AS n_right)
       |SELECT CAST(n_left AS BIGINT) AS n_left,
       |  CAST(n_right AS BIGINT) AS n_right,
       |  CAST(exact_rows AS BIGINT) AS exact_rows,
       |  CAST(est_d1 AS BIGINT) AS est_d1, CAST(est_d2 AS BIGINT) AS est_d2,
       |  CAST(est_d3 AS BIGINT) AS est_d3,
       |  CAST(est_rows AS BIGINT) AS est_rows,
       |  CAST((est_rows - exact_rows) * 1000000 // exact_rows AS BIGINT)
       |    AS over_ppm
       |FROM n CROSS JOIN ex CROSS JOIN est""".stripMargin
  }
}
