package graft.streaming

import graft.SparkSpec
import graft.operators.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q178 streaming twin: incrementally-folded chunk-fingerprint state
  * yields a report bit-equal to the batch operator across uneven
  * splits, re-delivery, and reversed delivery order. */
class ChunkDedupStreamSpec extends SparkSpec {

  private def docs: DataFrame = graft.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("source"), col("text"))

  private def run(batches: Seq[DataFrame]): (DataFrame, DataFrame) = {
    var state = ChunkDedupStream.emptyState(spark)
    var docState = ChunkDedupStream.emptyDocState(spark)
    var seen = TextStatsStream.emptySeen(spark)
    for (b <- batches) {
      val r = ChunkDedupStream.mergeBatch(state, docState, seen, b)
      state = r._1; docState = r._2; seen = r._3
    }
    (state, docState)
  }

  private def rows(df: DataFrame): Seq[(String, Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

  test("streamed report == batch q178 across splits + re-delivery + order") {
    val all = docs.localCheckpoint(true)
    val b1 = all.filter(col("doc_id") % 5 < 1)
    val b2 = all.filter(col("doc_id") % 5 >= 1 && col("doc_id") % 5 < 3)
    val b3 = all.filter(col("doc_id") % 5 >= 3)
    val batch = rows(TextQueries.chunkDedup(spark, sf))
    val (s1, d1) = run(Seq(b1, b2, b2 /* re-delivery */, b3))
    assert(rows(ChunkDedupStream.report(s1, d1)) === batch)
    val (s2, d2) = run(Seq(b3, b1, b2))
    assert(rows(ChunkDedupStream.report(s2, d2)) === batch)
    assert(batch.exists(r => r._4 < r._3),
      "no duplicated chunk in fixture — dedup leg vacuous")
  }
}
