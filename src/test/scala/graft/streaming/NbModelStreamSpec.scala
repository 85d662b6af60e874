package graft.streaming

import graft.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q184 streaming twin: the NB count-table model folded incrementally
  * scores the test split bit-equal to the batch fit, across uneven
  * splits, re-delivery, and reversed delivery order. */
class NbModelStreamSpec extends SparkSpec {

  private def docs: DataFrame = graft.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("source"), col("text"))

  private def run(batches: Seq[DataFrame]): (DataFrame, DataFrame) = {
    var tc = NbModelStream.emptyTc(spark)
    var cd = NbModelStream.emptyCd(spark)
    var seen = TextStatsStream.emptySeen(spark)
    for (b <- batches) {
      val r = NbModelStream.mergeBatch(tc, cd, seen, b)
      tc = r._1; cd = r._2; seen = r._3
    }
    (tc, cd)
  }

  private def rows(df: DataFrame): Seq[(String, String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq

  test("streamed score == batch q184 across splits + re-delivery + order") {
    val all = docs.localCheckpoint(true)
    val testSplit = all
      .filter(graft.functions.PortableHash.h60(col("text")) % 100 >= 90)
    val b1 = all.filter(col("doc_id") % 5 < 1)
    val b2 = all.filter(col("doc_id") % 5 >= 1 && col("doc_id") % 5 < 3)
    val b3 = all.filter(col("doc_id") % 5 >= 3)
    val batch = rows(Curation.nbConfusion(spark, sf))
    val (tc1, cd1) = run(Seq(b1, b2, b2 /* re-delivery */, b3))
    assert(rows(NbModelStream.score(tc1, cd1, testSplit)) === batch)
    val (tc2, cd2) = run(Seq(b3, b1, b2))
    assert(rows(NbModelStream.score(tc2, cd2, testSplit)) === batch)
    // the mixed feed must actually have filtered something: the model
    // saw only train docs, fewer than the full corpus
    val trained = cd1.agg(sum(col("n_docs_c"))).collect()(0).getLong(0)
    assert(trained > 0 && trained < all.count(), "split filter vacuous")
  }
}
