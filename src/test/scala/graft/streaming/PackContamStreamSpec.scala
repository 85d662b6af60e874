package graft.streaming

import graft.SparkSpec
import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q187 streaming twin: the window table folded incrementally over
  * doc_id-ordered batches reports bit-equal to batch q187, including a
  * re-delivered batch and windows straddling batch boundaries. */
class PackContamStreamSpec extends SparkSpec {

  private def docs: DataFrame = graft.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("source"), col("text"))

  private def run(batches: Seq[DataFrame]): DataFrame = {
    var wins = PackContamStream.emptyWins(spark)
    var off = 0L
    var seen = TextStatsStream.emptySeen(spark)
    for (b <- batches) {
      val r = PackContamStream.mergeBatch(wins, off, seen, b)
      wins = r._1; off = r._2; seen = r._3
    }
    wins
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq

  test("streamed report == batch q187 over ordered batches + re-delivery") {
    val all = docs.localCheckpoint(true)
    val batch = rows(Layout.packContamination(spark, sf))
    // doc_id-ordered splits whose boundaries do NOT align to window
    // boundaries — the straddling-window case is exercised by design
    val n = all.agg(max(col("doc_id"))).head().getLong(0)
    val b1 = all.filter(col("doc_id") <= n / 3)
    val b2 = all.filter(col("doc_id") > n / 3 && col("doc_id") <= 2 * n / 3)
    val b3 = all.filter(col("doc_id") > 2 * n / 3)
    val wins = run(Seq(b1, b2, b2 /* re-delivery */, b3))
    assert(rows(PackContamStream.report(wins)) === batch)
    // at least the first batch boundary must fall INSIDE a window for
    // the merge-by-sum claim to have been exercised: b1's token total
    // must not be ctxLen-aligned
    val b1Toks = b1
      .select(size(graft.functions.Text.tokens(col("text"))).cast("long")
        .as("n")).agg(sum(col("n"))).head().getLong(0)
    assert(b1Toks % 2048L != 0L,
      "fixture too aligned — boundary window never straddled")
  }
}
