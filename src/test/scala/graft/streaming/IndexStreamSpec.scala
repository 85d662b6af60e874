package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IndexStreamSpec extends SparkSpec {

  test("incremental index over uneven splits + a re-delivered batch " +
      "equals batch q125") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val cuts = Seq(ids.length / 5, ids.length / 2, ids.length * 4 / 5)
    val slices = (Seq(0) ++ cuts ++ Seq(ids.length)).sliding(2).map {
      case Seq(a, b) =>
        val lo = ids(a)
        val hi = if (b == ids.length) Long.MaxValue else ids(b)
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    }.toSeq
    var state = IndexStream.emptyState(spark)
    var indexed = IndexStream.emptyIndexed(spark)
    slices.zipWithIndex.foreach { case (slice, i) =>
      val r = IndexStream.mergeBatch(state, indexed, slice)
      state = r._1; indexed = r._2
      if (i == 1) { // at-least-once: re-deliver the second batch
        val r2 = IndexStream.mergeBatch(state, indexed, slice)
        state = r2._1; indexed = r2._2
      }
    }
    val streamed = IndexStream.report(state).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val batch = graft.operators.TextQueries.postingsIndex(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(streamed.toSeq === batch.toSeq)
    assert(indexed.count() === ids.length.toLong)
  }

  test("capped-prefix merge is exact when later batches bring smaller ids") {
    val s = spark
    import s.implicits._
    // term 'x' in 12 docs arriving high-ids-first: the final first-10
    // must contain the small ids from the LAST batch
    val mk = (ids: Seq[Long]) => ids.map(i => (i, "x")).toDF("doc_id", "text")
    var state = IndexStream.emptyState(spark)
    var indexed = IndexStream.emptyIndexed(spark)
    Seq(Seq(20L, 21L, 22L, 23L, 24L, 25L, 26L, 27L, 28L, 29L),
        Seq(1L, 2L)).foreach { ids =>
      val r = IndexStream.mergeBatch(state, indexed, mk(ids))
      state = r._1; indexed = r._2
    }
    val row = IndexStream.report(state).collect().head
    assert(row.getLong(1) === 12L)
    assert(row.getString(2) === "1,2,20,21,22,23,24,25,26,27")
  }
}
