package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of q86's sliding (hopping) windows: the SAME
  * `window(ts, "1 hour", "30 minutes")` aggregate in APPEND mode — each
  * window is emitted once the watermark passes its end. Events land in
  * two overlapping windows, and the micro-batch split is placed so that
  * one window receives events from BOTH batches (the state store must
  * hold the open window's partials across triggers). */
class SlidingWindowSpec extends SparkSpec {

  test("q86 wiring: streamed sliding windows equal the batch query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ev = graft.Tables.load(s, sf, "events")
      .select(expr("ts div 1000000000").as("sec"), col("event_type"),
        col("value"))
      .orderBy(col("sec")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def agg(df: DataFrame, streaming: Boolean): DataFrame = {
      val ts = df.toDF("sec", "event_type", "value")
        .select(timestamp_seconds(col("sec")).as("ts"), col("event_type"),
          col("value"))
      val base = if (streaming) ts.withWatermark("ts", "10 seconds") else ts
      base.groupBy(window(col("ts"), "1 hour", "30 minutes").as("win"),
          col("event_type"))
        .agg(count(lit(1)).as("pv_ct"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .select(unix_timestamp(col("win.start")).as("win_start"),
          col("event_type"), col("pv_ct"), col("sum_value"))
    }
    val in = MemoryStream[(Long, String, Double)]
    val q = agg(in.toDF(), streaming = true)
      .writeStream.format("memory").queryName("slide_stream")
      .outputMode(OutputMode.Append).start()
    val sentinelSec = ev.map(_._1).max + 100000L
    try {
      // split INSIDE a 30-min bucket so open windows span the trigger
      val cut = ev.length / 2
      in.addData(ev.take(cut): _*)
      q.processAllAvailable()
      in.addData(ev.drop(cut) :+ ((sentinelSec, "view", 0.0)): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))
      val streamed = s.table("slide_stream").collect().map(key).toMap
        .filter { case ((w, _), _) => w < sentinelSec - 3600 }
      val batch = graft.operators.RefQueries.slidingStats(s, sf)
        .collect().map(key).toMap
      assert(streamed === batch)
      assert(batch.size > 100)
      // overlap is real: total window-event mass is 2x the event count
      assert(batch.values.map(_._1).sum === 2L * ev.length)
    } finally q.stop()
  }
}
