package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvQuantileSpec extends SparkSpec {

  private def agg = KmvQuantile(4)

  test("reduce keeps the k smallest distinct (h, v) pairs, sorted") {
    val items = Seq((5L, 50L), (1L, 10L), (3L, 30L), (1L, 10L), (2L, 20L), (4L, 40L))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq === Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // same hash, different value: both retained, ordered by value
    val tied = Seq((1L, 7L), (1L, 3L)).foldLeft(agg.zero)(agg.reduce)
    assert(tied.toSeq === Seq((1L, 3L), (1L, 7L)))
  }

  test("merge == reduce over the concatenation (partials combine exactly)") {
    val xs = (0 until 40).map(i => ((i * 37 % 19).toLong, (i * 13 % 23).toLong))
    val (l, r) = xs.splitAt(17)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val direct = xs.foldLeft(agg.zero)(agg.reduce)
    assert(merged.toSeq === direct.toSeq)
  }

  test("under capacity the quantiles are exact over distinct values") {
    val a = KmvQuantile(100)
    val buf = Seq(9L, 1L, 5L, 5L, 3L, 7L).map(v => (v, v))
      .foldLeft(a.zero)(a.reduce)
    // distinct values 1,3,5,7,9 (m=5): idx50=(4*50)/100=2 -> 5,
    // idx90=(4*90)/100=3 -> 7, idx99=(4*99)/100=3 -> 7
    assert(a.finish(buf) === ((5L, 7L, 7L)))
  }

  test("q60 plans as a partial/final ObjectHashAggregate (bounded-state shuffle)") {
    val df = graft.operators.Curation.lenQuantiles(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_kmvquantile"), plan)
  }

  test("q60 sketch quantiles bracket the exact distinct-value quantiles") {
    // the sample is uniform over distinct values; with k=64 and small
    // domains the sketch should stay within the value range and be
    // monotone p50 <= p90 <= p99
    graft.operators.Curation.lenQuantiles(spark, sf).collect().foreach { r =>
      val (p50, p90, p99) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(p50 <= p90 && p90 <= p99)
      assert(p50 > 0)
    }
  }
}
