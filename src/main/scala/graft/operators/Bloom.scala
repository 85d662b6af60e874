package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash

/** q135: Bloom-filter semi-join reduction — the runtime-filter pattern
  * (Spark's InjectRuntimeFilter / the classic semi-join reducer) made
  * EXPLICIT and engine-portable: a compact bit-set built from the
  * selective build side prunes the probe side BEFORE its shuffle, and the
  * declared query is the audit a production rollout reads — probe rows,
  * rows passing the filter, true matches, false positives, and the
  * achieved false-positive rate in ppm.
  *
  * Why it matters at 100 TB: a selective dimension predicate (here:
  * urgent orders) reduces the join's useful probe rows to a fraction, but
  * a plain shuffle join still shuffles EVERY probe row. The bloom filter
  * is metadata-sized (2¹⁸ bits = 8 K words, broadcast), applied at scan
  * time; only passing rows reach the exchange — BloomSpec measures the
  * shuffle-row reduction with SQLMetrics. No false negatives by
  * construction (spec-asserted): every true match survives.
  *
  * Portability: keys hash with [[PortableHash.h60]]; the k=3 bit
  * positions are the universal-hash slot rehashes mod 2¹⁸; words pack 32
  * bits (bit 63 would trip DuckDB's checked `<<`), OR-folded by a
  * `bit_or` aggregate — order-free, partial-aggregation friendly, and
  * mergeable (two filters OR together), the same property q132 leans on.
  * The DuckDB oracle rebuilds the identical filter and classification.
  */
object Bloom {
  val MBits = 1 << 18
  val K = 3

  /** The k portable bit positions of a key column (non-negative). */
  private def positions(key: Column): Seq[Column] = {
    val h = PortableHash.h60(key.cast("string")) % PortableHash.P
    (1 to K).map(i => PortableHash.slotHash(i, h) % MBits)
  }

  /** (word_idx, bits) bloom frame over a key frame — ≤ MBits/32 rows. */
  def buildFilter(keys: DataFrame, keyCol: String): DataFrame =
    keys
      .select(explode(array(positions(col(keyCol)): _*)).as("p"))
      .select(expr("p div 32").as("w"),
        expr("CAST(p % 32 AS INT)").as("b"))
      .groupBy(col("w"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), b)")).as("bits"))

  /** Keep only probe rows whose key MIGHT be in the filter (no false
    * negatives; FP rate set by MBits/K vs the build cardinality).
    *
    * The bit-set is collected to the driver as ONE dense word array
    * (MBits/32 = 8 K longs, 64 KB — a CONSTANT, never data-proportional)
    * and embedded as an array literal, so the probe side evaluates all K
    * membership tests inside its scan's WholeStageCodegen filter — zero
    * joins, zero exchanges. This is exactly how production runtime
    * filters work (Spark's InjectRuntimeFilter ships a driver-built
    * `bloom_filter_agg` bitset into a scan-side `might_contain`; guide
    * §3.2's manual `df.stat.bloomFilter` does the same) — the previous
    * form spent K broadcast hash joins per probe row to emulate one
    * array lookup (measured: 3 BroadcastHashJoins → 0 in the q135 plan). */
  def prefilter(probe: DataFrame, keyCol: String,
                bloom: DataFrame): DataFrame = {
    val dense = new Array[Long](MBits / 32)
    // select by NAME before the (eager, composition-time) collect: a
    // caller supplying a valid bloom frame with (bits, w) column order
    // would silently corrupt the filter under positional reads (ADVICE
    // r14). Note prefilter is eager in the bloom argument by design —
    // the 64 KB bitset is driver-held, the broadcast-relation class.
    bloom.select(col("w"), col("bits")).collect()
      .foreach(r => dense(r.getLong(0).toInt) = r.getLong(1))
    val words = typedLit(dense.toSeq)
    val pos = positions(col(keyCol))
    // p < 2¹⁸ and non-negative, so word index = p >> 5 and bit = p & 31
    // (exact integer forms — `/` on Columns is double division)
    pos.foldLeft(probe) { (df, p) =>
      df.filter(
        element_at(words, shiftright(p, 5).cast("int") + lit(1))
          .bitwiseAND(call_function("shiftleft", lit(1L),
            p.bitwiseAND(lit(31L)).cast("int")))
          =!= lit(0L))
    }
  }

  /** The declared audit query: lineitem probed against the bloom filter
    * of urgent orders' keys. */
  def bloomJoinAudit(s: SparkSession, dir: String): DataFrame = {
    val build = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k")).distinct()
      .persist()
    val bloom = buildFilter(build, "k")
    val probe = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("k"))
    val classified = prefilter(probe, "k", bloom)
      .join(build.withColumn("is_true", lit(1L)), Seq("k"), "left")
      .select(coalesce(col("is_true"), lit(0L)).as("tm"))
    val totals = probe.agg(count(lit(1)).as("probe_rows"))
    classified
      .agg(count(lit(1)).as("passed_rows"), sum(col("tm")).as("true_matches"))
      .crossJoin(totals)
      .select(col("probe_rows"), col("passed_rows"), col("true_matches"),
        (col("passed_rows") - col("true_matches")).as("false_positives"),
        expr("(passed_rows - true_matches) * 1000000 div " +
          "(probe_rows - true_matches)").as("fp_ppm"))
  }

  /** DuckDB oracle rebuilding the identical filter and audit. */
  val bloomJoinAuditSql: String = {
    def posSql(i: Int, keyExpr: String): String = {
      val h = s"((${PortableHash.h60Sql(s"CAST($keyExpr AS VARCHAR)")}) % ${PortableHash.P})"
      s"(${PortableHash.slotHashSql(i, h)}) % $MBits"
    }
    val buildPos = (1 to K).map(i => posSql(i, "k")).mkString(", ")
    val probeJoins = (1 to K).map { i =>
      s"""JOIN bloom b$i ON b$i.w = p$i // 32
         |  AND (b$i.bits & (1::BIGINT << CAST(p$i % 32 AS INT))) != 0"""
        .stripMargin
    }.mkString("\n")
    s"""WITH build AS MATERIALIZED (SELECT DISTINCT o_orderkey AS k
       |  FROM orders WHERE o_orderpriority = '1-URGENT'),
       |pos AS (SELECT unnest([$buildPos]) AS p FROM build),
       |bloom AS MATERIALIZED (SELECT p // 32 AS w,
       |    bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
       |  FROM pos GROUP BY 1),
       |probe AS (SELECT l_orderkey AS k,
       |    ${(1 to K).map(i => s"${posSql(i, "l_orderkey")} AS p$i")
             .mkString(",\n    ")}
       |  FROM lineitem),
       |passed AS (SELECT probe.k FROM probe
       |$probeJoins),
       |cls AS (SELECT CASE WHEN build.k IS NOT NULL THEN 1 ELSE 0 END AS tm
       |  FROM passed LEFT JOIN build ON build.k = passed.k),
       |tot AS (SELECT COUNT(*) AS probe_rows FROM probe),
       |agg AS (SELECT COUNT(*) AS passed_rows, SUM(tm) AS true_matches
       |  FROM cls)
       |SELECT CAST(probe_rows AS BIGINT) AS probe_rows,
       |  CAST(passed_rows AS BIGINT) AS passed_rows,
       |  CAST(true_matches AS BIGINT) AS true_matches,
       |  CAST(passed_rows - true_matches AS BIGINT) AS false_positives,
       |  CAST((passed_rows - true_matches) * 1000000
       |    // (probe_rows - true_matches) AS BIGINT) AS fp_ppm
       |FROM agg CROSS JOIN tot""".stripMargin
  }
}
