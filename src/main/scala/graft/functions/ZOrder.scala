package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton) space-filling curve key — the data-LAYOUT half of the
  * 100 TB story. Partition pruning and parquet min/max row-group skipping
  * only help when the file layout clusters the filtered dimensions;
  * sorting by ONE column leaves every other column's min/max spanning the
  * whole domain, so filters on a second dimension prune nothing. Writing
  * files ordered by the bit-interleaved key keeps BOTH dimensions' ranges
  * tight per chunk, so 2-D selective scans skip most files — the layout
  * trick behind Delta/Iceberg OPTIMIZE ZORDER, here as a plain codegen'd
  * Column usable in `sortWithinPartitions`/`repartitionByRange` before
  * any parquet write (e.g. the K4 warehouse sink).
  *
  * The interleave is pure shift/mask arithmetic — identical in Spark and
  * DuckDB (the paired `*Sql` generator), so the q94 layout audit is
  * verified by the driver's rows+schema+hash oracle like every other
  * query. ZOrderSpec measures the claim: chunk min/max stats under a
  * z-sorted layout prune a second-dimension band filter that a
  * single-column sort cannot.
  */
object ZOrder {

  /** Interleave the low `bits` of two non-negative long columns:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** DuckDB SQL computing exactly [[zValue]] over BIGINT expressions. */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i + 1})",
          s"((($b >> $i) & 1) << ${2 * i})")
    }.mkString("(", " | ", ")")

  /** Reference implementation for the spec (bit-twiddling, no Spark). */
  def zValueLocal(a: Long, b: Long, bits: Int = 16): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }

  /** q94: layout audit of lineitem z-ordered on (l_partkey, l_suppkey) —
    * each key scaled to the 16-bit grid by its own max (broadcast
    * single-row stats, the q46 pattern), rows bucketed by the top 8 z
    * bits (a 16×16 grid), per-bucket row counts and raw min/max of both
    * dimensions. The min/max spans ARE the audit: under z-order each
    * bucket covers ~1/16 of each dimension — exactly the row-group stats
    * a 100 TB scan would prune on. Scale shape: one broadcast of a
    * single stats row, one partial/final aggregate; the key itself is 64
    * shift-mask ops inside whole-stage codegen. */
  def layoutAudit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val stats = li.agg(max(col("l_partkey")).as("pa"),
      max(col("l_suppkey")).as("sa"))
    val normed = li.select(col("l_partkey"), col("l_suppkey"))
      .crossJoin(broadcast(stats))
      .select(col("l_partkey"), col("l_suppkey"),
        expr("(CAST(l_partkey AS BIGINT) * 65536) div (pa + 1)").as("an"),
        expr("(CAST(l_suppkey AS BIGINT) * 65536) div (sa + 1)").as("bn"))
    normed
      .withColumn("z_bucket", shiftright(zValue(col("an"), col("bn")), 24))
      .groupBy(col("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
      .orderBy(col("z_bucket"))
  }
}
