package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("zValue matches the local bit-twiddling reference") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val samples = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L),
      (43690L, 21845L)) ++ // 0b1010.. x 0b0101..
      Seq.fill(50)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val out = samples.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (a, b, z) =>
      assert(z === ZOrder.zValueLocal(a, b), s"($a, $b)")
    }
    // full-width inputs interleave to all 32 ones; the alternating pair
    // lands on the 0x9 nibble pattern (bits {2i} from b, {2i+1} from a)
    assert(ZOrder.zValueLocal(65535L, 65535L) === (1L << 32) - 1)
    assert(ZOrder.zValueLocal(43690L, 21845L) === 0x99999999L)
  }

  // simulate a file layout: sort by `order`, cut into n equal chunks,
  // record each chunk's min/max of `dim` — the row-group stats a reader
  // would prune on
  private def chunkSpans(df: DataFrame, order: Seq[Column], dim: String,
                         n: Int): Seq[(Long, Long)] =
    df.withColumn("c", ntile(n).over(Window.orderBy(order: _*)))
      .groupBy(col("c"))
      .agg(min(col(dim)).as("lo"), max(col(dim)).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

  private def touched(spans: Seq[(Long, Long)], lo: Long, hi: Long): Int =
    spans.count { case (a, b) => a <= hi && b >= lo }

  test("z-sorted layout prunes BOTH dimensions; single sorts only their own") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val Seq(pa, sa) = li.agg(max(col("l_partkey")), max(col("l_suppkey")))
      .collect().map(r => Seq(r.getLong(0), r.getLong(1))).head
    val withZ = li.select(col("l_partkey"), col("l_suppkey"),
      ZOrder.zValue(
        (col("l_partkey") * 65536L) / lit(pa + 1) cast "long",
        (col("l_suppkey") * 65536L) / lit(sa + 1) cast "long").as("z"))
    val n = 64
    val zOrd = Seq(col("z"), col("l_partkey"), col("l_suppkey"))
    // single-column sorts: the tiebreak must SCRAMBLE the other key (a
    // hash models arrival order) — tiebreaking on it would smuggle in
    // exactly the locality the comparison is supposed to lack
    val byPart = Seq(col("l_partkey"),
      xxhash64(col("l_suppkey"), col("z")))
    val bySupp = Seq(col("l_suppkey"),
      xxhash64(col("l_partkey"), col("z")))

    // a one-supplier filter: invisible to a partkey-sorted layout, mostly
    // pruned under z-order
    val suppBandZ = touched(chunkSpans(withZ, zOrd, "l_suppkey", n), 3L, 3L)
    val suppBandLin = touched(chunkSpans(withZ, byPart, "l_suppkey", n), 3L, 3L)
    assert(suppBandLin > n / 2, s"partkey sort should not prune: $suppBandLin")
    assert(suppBandZ * 2 < suppBandLin,
      s"z-order should halve touched chunks: $suppBandZ vs $suppBandLin")

    // a 5% partkey band: invisible to a suppkey-sorted layout, still
    // mostly pruned under z-order
    val lo = pa / 2; val hi = pa / 2 + pa / 20
    val partBandZ = touched(chunkSpans(withZ, zOrd, "l_partkey", n), lo, hi)
    val partBandLin = touched(chunkSpans(withZ, bySupp, "l_partkey", n), lo, hi)
    assert(partBandLin > n / 2, s"suppkey sort should not prune: $partBandLin")
    assert(partBandZ * 2 < partBandLin,
      s"z-order should halve touched chunks: $partBandZ vs $partBandLin")
  }

  test("q94 audit buckets have bounded spans in both dimensions") {
    val rows = ZOrder.layoutAudit(spark, sf).collect()
    assert(rows.length > 8) // a real grid, not one bucket
    val totalRows = rows.map(_.getLong(1)).sum
    val li = graft.Tables.load(spark, sf, "lineitem").count()
    assert(totalRows === li)
    // top-8-bit buckets cover a 16x16 grid: each bucket's partkey span is
    // ~1/16 of the domain (generous 4x slack for rounding and data gaps)
    val pa = rows.map(_.getLong(3)).max
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= pa / 4,
        s"bucket ${r.getLong(0)} partkey span too wide")
    }
  }
}
