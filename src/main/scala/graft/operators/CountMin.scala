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
    top
      .select(col("t"), col("exact_ct"), explode(array(probes: _*)).as("r"))
      .select(col("t"), col("exact_ct"), col("r.i").as("i"),
        col("r.pos").as("pos"))
      .join(broadcast(cells), Seq("i", "pos"))
      .groupBy(col("t").as("token"), col("exact_ct"))
      .agg(min(col("c")).as("est_ct"))
      .select(col("token"), col("exact_ct"), col("est_ct"),
        expr("(est_ct - exact_ct) * 1000000 div exact_ct").as("over_ppm"))
      .orderBy(col("exact_ct").desc, col("token"))
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
}
