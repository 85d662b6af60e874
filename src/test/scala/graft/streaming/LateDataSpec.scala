package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Late-data accounting: the watermark CONTRACT is that rows older than
  * (max event time − delay) may be dropped — this spec pins (a) exactly
  * which rows drop, (b) that the drop is OBSERVABLE in the streaming
  * progress metrics (`numRowsDroppedByWatermark`), the counter a
  * production pipeline alerts on (the reference's Flink jobs expose the
  * same signal as a side-output; Spark exposes it as a state-operator
  * metric). Without (b), silently vanishing late events are
  * indistinguishable from upstream loss. */
class LateDataSpec extends SparkSpec {

  test("watermark drops late rows exactly and reports them in progress metrics") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    def agg(df: DataFrame): DataFrame =
      df.toDF("user_id", "sec", "value")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
          col("value"))
        .withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "60 seconds").as("win"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
        .select(unix_timestamp(col("win.start")).as("win_start"), col("n"),
          col("sv"))

    val in = MemoryStream[(Long, Long, Double)]
    val q = agg(in.toDF()).writeStream.format("memory")
      .queryName("late_stream").outputMode(OutputMode.Append).start()
    try {
      // batch 1: window [60,120) gets two rows; max event time 200 →
      // watermark after the trigger = 190
      in.addData((1L, 70L, 1.0), (2L, 80L, 2.0), (3L, 200L, 4.0))
      q.processAllAvailable()
      // batch 2: sec=75 is BELOW the 190 watermark → must drop (its
      // window [60,120) is already finalized); sec=195 is above → kept
      in.addData((4L, 75L, 8.0), (5L, 195L, 16.0))
      q.processAllAvailable()
      // seal everything
      in.addData((9L, 10000L, 0.0))
      q.processAllAvailable()

      val rows = s.table("late_stream").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // the late row did NOT make it into its window...
      assert(rows(60L) === ((2L, 3.0)))
      // ...but the on-time batch-2 row did land in the open window
      assert(rows(180L) === ((2L, 20.0)))
      // and the drop is observable, with the exact count
      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped === 1L, s"expected exactly 1 dropped row, got $dropped")
    } finally q.stop()
  }
}
