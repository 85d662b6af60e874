package graft.streaming

import graft.SparkSpec
import graft.operators.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q172/q174 streaming twin: the incrementally-folded gram-df state
  * yields reports bit-equal to the batch operators across uneven
  * splits, re-delivery, and reversed delivery order. */
class DupSpanStreamSpec extends SparkSpec {

  private def docs: DataFrame = graft.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"))

  test("streamed spans + strip == batch q172/q174 across splits + re-delivery") {
    val all = docs.localCheckpoint(true)
    val b1 = all.filter(col("doc_id") % 7 < 2)
    val b2 = all.filter(col("doc_id") % 7 >= 2 && col("doc_id") % 7 < 5)
    val b3 = all.filter(col("doc_id") % 7 >= 5)
    var state = DupSpanStream.emptyState(spark)
    var seen = TextStatsStream.emptySeen(spark)
    for (b <- Seq(b2, b1, b1 /* re-delivery */, b3)) {
      val r = DupSpanStream.mergeBatch(state, seen, b)
      state = r._1; seen = r._2
    }
    val sSpans = DupSpanStream.spansReport(all, state).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val bSpans = TextQueries.dupSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(sSpans === bSpans)
    val sStrip = DupSpanStream.stripReport(all, state).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    val bStrip = TextQueries.spanStrip(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(sStrip === bStrip)
    assert(bSpans.exists(_._3 > 0), "fixture corpus has dup spans")
  }
}
