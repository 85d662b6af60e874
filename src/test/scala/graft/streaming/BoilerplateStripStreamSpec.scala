package graft.streaming

import graft.SparkSpec
import graft.operators.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q141 streaming twin: incrementally-mined boilerplate state folds to
  * the batch mine under any delivery order/split, re-delivery is a
  * no-op, and the report is bit-equal to the batch strip on the
  * delivered corpus. */
class BoilerplateStripStreamSpec extends SparkSpec {

  private def docs: DataFrame = graft.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"))

  private def stripRows(df: DataFrame): Seq[(Long, Long, Long, String)] =
    df.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("streamed mine+strip == batch q141 across uneven splits + re-delivery") {
    val all = docs.localCheckpoint(true)
    val b1 = all.filter(col("doc_id") % 10 < 2)
    val b2 = all.filter(col("doc_id") % 10 >= 2 && col("doc_id") % 10 < 3)
    val b3 = all.filter(col("doc_id") % 10 >= 3)
    var state = BoilerplateStripStream.emptyState(spark)
    var seen = TextStatsStream.emptySeen(spark)
    for (b <- Seq(b1, b2, b2 /* at-least-once re-delivery */, b3)) {
      val r = BoilerplateStripStream.mergeBatch(state, seen, b)
      state = r._1; seen = r._2
    }
    val streamed = stripRows(BoilerplateStripStream.report(all, state))
    val batch = stripRows(TextQueries.boilerplateStripDf(spark, all))
    assert(streamed === batch)
    assert(streamed.exists(_._3 > 0), "fixture corpus has boilerplate hits")
  }

  test("delivery order does not change the mined state") {
    val all = docs.localCheckpoint(true)
    val parts = Seq(
      all.filter(col("doc_id") % 3 === 0),
      all.filter(col("doc_id") % 3 === 1),
      all.filter(col("doc_id") % 3 === 2))
    def foldIn(order: Seq[DataFrame]): Seq[(String, Long)] = {
      var state = BoilerplateStripStream.emptyState(spark)
      var seen = TextStatsStream.emptySeen(spark)
      order.foreach { b =>
        val r = BoilerplateStripStream.mergeBatch(state, seen, b)
        state = r._1; seen = r._2
      }
      state.orderBy(col("shingle")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    assert(foldIn(parts) === foldIn(parts.reverse))
    // and the folded df table IS the batch mine's df table
    val batchDf = all
      .select(graft.functions.Text.tokens(col("text")).as("toks"))
      .select(explode(graft.functions.Text.shingles(col("toks"))).as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .orderBy(col("shingle")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(foldIn(parts) === batchDf)
  }
}
