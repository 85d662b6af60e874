package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental rolling-daily maintenance (the q83 twin): foreachBatch
  * merges each micro-batch into the persisted day-counts and distinct
  * (day, user) pair tables; the report re-derived from state must equal
  * batch q83 — including batches that SPLIT A DAY (partials must sum)
  * and re-deliver pairs (the anti-join must no-op). */
class RollingStreamSpec extends SparkSpec {

  test("foreachBatch rolling report over real events equals batch q83") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val stage = java.nio.file.Files
      .createTempDirectory("graft-rolling").toString
    val (cPath, pPath) = (s"$stage/counts", s"$stage/pairs")
    val ev = graft.Tables.load(s, sf, "events")
      .select(col("user_id"), expr("ts div 1000000000").as("sec"))
      .orderBy(col("sec"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("user_id", "sec").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        def prior(p: String, empty: => DataFrame) =
          if (new java.io.File(p).exists) s.read.parquet(p) else empty
        val counts = RollingStream.mergeCounts(
          prior(cPath, RollingStream.emptyCounts(s)), batch)
          .localCheckpoint(true)
        val pairs = RollingStream.mergePairs(
          prior(pPath, RollingStream.emptyPairs(s)), batch)
          .localCheckpoint(true)
        counts.write.mode("overwrite").parquet(cPath)
        pairs.write.mode("overwrite").parquet(pPath)
        (): Unit
      }.start()
    try {
      // uneven cuts; 137|138 splits a day across batches, and the last
      // batch RE-DELIVERS a slice of the first (at-least-once upstream) —
      // the pair anti-join must absorb it without double counting
      // actives (re-sent events DO recount n_events, so exclude them:
      // deliver the resend as pairs-only by replaying sec-only... instead
      // simply verify idempotence of pairs via a duplicate-free overlap)
      val cuts = Seq(0, 137, 138, 600, ev.length)
      cuts.sliding(2).foreach { case Seq(a, b) =>
        input.addData(ev.slice(a, b): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = RollingStream.report(
        s.read.parquet(cPath), s.read.parquet(pPath)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = graft.operators.RefQueries.rollingDaily(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
    // pair re-delivery is a no-op: merging the first slice again leaves
    // the distinct-actives state unchanged
    val again = RollingStream.mergePairs(s.read.parquet(pPath),
      s.createDataFrame(ev.take(137).toSeq).toDF("user_id", "sec"))
    assert(again.count() === s.read.parquet(pPath).count())
  }
}
