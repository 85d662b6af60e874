package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming point-in-time enrichment — ScdStream × AsOf composed into
  * the full production loop of q72: one foreachBatch pass per trigger
  * (1) merges the batch's state-change events into the maintained SCD2
  * history and (2) enriches the batch's purchase events against that
  * history AS OF each purchase's own event time. Under time-ordered
  * ingest a purchase's governing version is final the moment the
  * purchase arrives (no later change can open at an earlier time), so
  * the per-batch enrichment is append-only — and must equal batch q72
  * over the same events.
  *
  * This is the time-correct replacement for the reference's enrich-at-
  * lookup-time dim join (DimUtil.java getDimInfo): replaying the same
  * stream always reproduces the same enrichment, regardless of when the
  * job ran or how the stream was micro-batched.
  */
class PitEnrichStreamSpec extends SparkSpec {

  test("per-batch SCD2 merge + as-of enrichment equals batch q72") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val stage = java.nio.file.Files.createTempDirectory("graft-pit-stream").toString
    val histPath = s"$stage/hist"
    val outPath = s"$stage/enriched"

    val ev = graft.Tables.load(s, sf, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"),
        col("event_type"), col("value"))
      .orderBy(col("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))

    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val q = input.toDF()
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prior =
          if (new java.io.File(histPath).exists) s.read.parquet(histPath)
          else ScdStream.emptyHistory(s)
        // 1. maintain the dim history from the batch's change events
        val merged = ScdStream.mergeBatch(prior,
            batch.filter(col("event_type").isin("signup", "error"))
              .select(col("user_id"), col("us"), col("event_id"),
                col("event_type").as("status")))
          .localCheckpoint(true)
        merged.write.mode("overwrite").parquet(histPath)
        // 2. enrich THIS batch's purchases against the history as of
        // their own event time (versions <= ts are final under ordered
        // ingest, so the result is append-only)
        graft.operators.Scd.pointInTimeEnrichFrom(batch, merged)
          .write.mode("append").parquet(outPath)
        (): Unit
      }.start()
    try {
      val cuts = Seq(0, 1000, 1001, 4000, 7777, ev.length)
      cuts.sliding(2).foreach { case Seq(a, b) =>
        input.addData(ev.slice(a, b): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("ts_us"), r.getAs[Double]("value"),
        Option(r.getAs[Any]("state_from")), Option(r.getAs[Any]("state")),
        Option(r.getAs[Any]("state_events")))).toSet
    val streamed = rows(s.read.parquet(outPath))
    val batchQ72 = rows(graft.operators.Scd.pointInTimeEnrich(s, sf))
    assert(streamed === batchQ72)
    // fixture is non-degenerate: enriched and pre-first-version purchases
    assert(batchQ72.exists(_._6.isDefined) && batchQ72.exists(_._6.isEmpty))
    assert(batchQ72.size > 100)
  }
}
