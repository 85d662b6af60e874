package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of q30's gap-based sessionization: Spark's native
  * session_window in APPEND mode — a session is sealed and emitted once
  * the watermark passes its close (no later event can extend it). Events
  * are split across micro-batches MID-SESSION, so the state store must
  * merge the open session across triggers before emitting. The streamed
  * sessions must equal the batch session_window over the same events.
  */
class SessionWindowSpec extends SparkSpec {

  test("session_window merges across micro-batches and seals on watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val gap = "30 seconds"

    // user 1: one session (events 100s,110s,125s — gaps < 30s), then a
    // second session at 300s; user 2: a single event session at 120s
    val batch1 = Seq((1L, 100L, 2.0), (2L, 120L, 5.0), (1L, 110L, 3.0))
    val batch2 = Seq((1L, 125L, 1.0), (1L, 300L, 7.0))
    val sentinel = Seq((9L, 10000L, 0.0)) // watermark past every session

    def sessions(df: DataFrame, streaming: Boolean): DataFrame = {
      val ts = df.toDF("user_id", "sec", "value")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("value"))
      val base = if (streaming) ts.withWatermark("ts", "5 seconds") else ts
      base.groupBy(col("user_id"), session_window(col("ts"), gap))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("session_start"),
          col("n_events"), col("sum_value"))
    }

    val in = MemoryStream[(Long, Long, Double)]
    val q = sessions(in.toDF(), streaming = true)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2 ++ sentinel: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))
      val streamed = s.table("sess_stream").collect().map(key).toMap
      val batch = sessions((batch1 ++ batch2).toDF(), streaming = false)
        .collect().map(key).toMap
      assert(streamed === batch)
      // the mid-session split merged: user 1's first session spans both
      // batches with all 3 events
      assert(streamed((1L, 100L)) === ((3L, 6.0)))
      assert(streamed((1L, 300L)) === ((1L, 7.0)))
      assert(streamed((2L, 120L)) === ((1L, 5.0)))
    } finally q.stop()
  }

  test("q74 wiring: streamed session visitor stats equal the batch query") {
    // the declared q74 frame driven through session_window in APPEND mode
    // over the REAL events table, split mid-stream: sealed sessions must
    // equal batch q74 row for row
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ev = graft.Tables.load(s, sf, "events")
      .select(col("user_id"), expr("ts div 1000000000").as("sec"),
        col("event_type"))
      .orderBy(col("sec")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def stats(df: DataFrame, streaming: Boolean): DataFrame = {
      val ts = df.toDF("user_id", "sec", "event_type")
        .select(col("user_id"), col("sec"),
          timestamp_seconds(col("sec")).as("ts"), col("event_type"))
      val base = if (streaming) ts.withWatermark("ts", "10 seconds") else ts
      base.groupBy(col("user_id"), session_window(col("ts"), "1800 seconds"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("pv"),
          (max(col("sec")) - min(col("sec"))).as("duration_sec"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("session_start"),
          col("n_events"), col("pv"), col("duration_sec"),
          (col("n_events") === 1L).as("is_bounce"))
    }
    val in = MemoryStream[(Long, Long, String)]
    val q = stats(in.toDF(), streaming = true)
      .writeStream.format("memory").queryName("q74_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val (h1, h2) = ev.splitAt(ev.length / 2)
      in.addData(h1: _*)
      q.processAllAvailable()
      // sentinel far past the last session so the watermark seals all
      in.addData(h2 :+ ((999L, ev.map(_._2).max + 100000L, "view")): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      val streamed = s.table("q74_stream").collect().map(key).toMap - ((999L, ev.map(_._2).max + 100000L))
      val batch = graft.operators.RefQueries.sessionVisitorStats(s, sf)
        .collect().map(key).toMap
      assert(streamed === batch)
      assert(batch.size > 100)
      // the upgrade is real: sessions with dwell time and multi-event pv exist
      assert(batch.values.exists(v => v._3 > 0 && v._1 > 1))
    } finally q.stop()
  }
}
