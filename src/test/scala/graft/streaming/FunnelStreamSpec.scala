package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class FunnelStreamSpec extends SparkSpec {

  test("incremental funnel state across micro-batches equals batch q75") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val stage = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    val statePath = s"$stage/state"

    val ev = graft.Tables.load(s, sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    val input = MemoryStream[(Long, Long, String)]
    val q = input.toDF().toDF("user_id", "us", "event_type").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prior =
          if (new java.io.File(statePath).exists) s.read.parquet(statePath)
          else FunnelStream.emptyState(s)
        FunnelStream.mergeBatch(prior, batch).localCheckpoint(true)
          .write.mode("overwrite").parquet(statePath)
        (): Unit
      }.start()
    try {
      val cuts = Seq(0, 313, 2000, 2001, ev.length)
      cuts.sliding(2).foreach { case Seq(a, b) =>
        input.addData(ev.slice(a, b): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)),
        r.getBoolean(4), r.getBoolean(5))).toSet
    val streamed = rows(FunnelStream.report(s.read.parquet(statePath))
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        col("s2_in_window"), col("converted")))
    val batch = rows(graft.operators.RefQueries.funnelPaths(s, sf))
    assert(streamed === batch)
    assert(batch.exists(_._6) && batch.exists(r => !r._6)) // non-degenerate
  }

  test("anchors are final: a cross-batch step pair resolves like one batch") {
    val s = spark
    import s.implicits._
    // view in batch 1; click (valid) and purchase in batch 2; a second,
    // earlier-in-value-but-later-arriving click never occurs under ordered
    // ingest, so the anchor set in batch 2 is final
    val b1 = Seq((1L, 100L, "view"), (2L, 50L, "click"))
    val b2 = Seq((1L, 200L, "click"), (1L, 300L, "purchase"), (2L, 60L, "view"))
    var st = FunnelStream.emptyState(s)
    Seq(b1, b2).foreach { b =>
      st = FunnelStream.mergeBatch(st,
        b.toDF("user_id", "us", "event_type")).localCheckpoint(true)
    }
    val out = st.orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3))))
    // u1 completes the funnel across the split; u2's pre-anchor click was
    // discarded and its later view starts a fresh path
    assert(out.toSeq === Seq(
      (1L, 100L, Some(200L), Some(300L)),
      (2L, 60L, None, None)))
  }
}
