package graft.streaming

import graft.SparkSpec
import graft.operators.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q188 streaming twin: the bigram-LM count store folded incrementally
  * buckets the corpus bit-equal to the batch fit, across uneven splits,
  * re-delivery, and reversed delivery order. */
class PplModelStreamSpec extends SparkSpec {

  private def docs: DataFrame = graft.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("source"), col("text"))

  private def run(batches: Seq[DataFrame]): (DataFrame, DataFrame) = {
    var bc = PplModelStream.emptyBc(spark)
    var tv = PplModelStream.emptyTv(spark)
    var seen = TextStatsStream.emptySeen(spark)
    for (b <- batches) {
      val r = PplModelStream.mergeBatch(bc, tv, seen, b)
      bc = r._1; tv = r._2; seen = r._3
    }
    (bc, tv)
  }

  private def rows(df: DataFrame): Seq[(String, String, Long, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq

  test("streamed score == batch q188 across splits + re-delivery + order") {
    val all = docs.localCheckpoint(true)
    val batch = rows(TextQueries.pplBuckets(spark, sf))
    val b1 = all.filter(col("doc_id") % 5 < 1)
    val b2 = all.filter(col("doc_id") % 5 >= 1 && col("doc_id") % 5 < 3)
    val b3 = all.filter(col("doc_id") % 5 >= 3)
    val (bc1, tv1) = run(Seq(b1, b2, b2 /* re-delivery */, b3))
    assert(rows(PplModelStream.score(bc1, tv1, all)) === batch)
    val (bc2, tv2) = run(Seq(b3, b1, b2))
    assert(rows(PplModelStream.score(bc2, tv2, all)) === batch)
    // the split filter inside mergeBatch must have excluded the val/test
    // docs from the model: train token MASS < total corpus token mass
    // (tiny corpora share every token TYPE across splits, so compare mass)
    val mTrain = tv1.agg(sum(col("c_t"))).collect()(0).getLong(0)
    val mAll = all
      .select(size(graft.functions.Text.tokens(col("text"))).cast("long")
        .as("n")).agg(sum(col("n"))).collect()(0).getLong(0)
    assert(mTrain > 0 && mTrain < mAll, "train filter vacuous")
  }
}
