package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ScdStreamSpec extends SparkSpec {

  private def histSet(df: DataFrame) = df.collect().map(r =>
    (r.getAs[Long]("user_id"), r.getAs[String]("status"),
      r.getAs[Long]("valid_from"), Option(r.getAs[Any]("valid_to")),
      r.getAs[Long]("n_events"), r.getAs[Boolean]("is_current"),
      r.getAs[Long]("run_id"))).toSet

  private def batchTruth(events: Seq[(Long, Long, Long, String)]): Set[_] = {
    val s = spark; import s.implicits._
    histSet(graft.operators.Scd.scd2HistoryFrom(
      events.toDF("user_id", "us", "event_id", "status")))
  }

  test("mergeBatch across splits equals batch q71 construction (incl. mid-run split)") {
    val s = spark; import s.implicits._
    // user 1: run A (events 1,2) SPLIT MID-RUN across batches 1/2, then
    //   B (3), then A again (4) — re-entering a status must open a NEW run
    // user 2: single run C across all three batches (extend twice)
    // user 3: appears first in batch 3 (no open version to seed)
    val all = Seq(
      (1L, 100L, 1L, "A"), (1L, 200L, 2L, "A"), (1L, 300L, 3L, "B"),
      (1L, 400L, 4L, "A"),
      (2L, 110L, 5L, "C"), (2L, 210L, 6L, "C"), (2L, 310L, 7L, "C"),
      (3L, 320L, 8L, "X"))
    val splits = Seq(
      Seq(all(0), all(4)),                   // A(1) | C(5)
      Seq(all(1), all(2), all(5)),           // A(2) mid-run, B(3) | C(6)
      Seq(all(3), all(6), all(7)))           // A(4) | C(7) | X(8)
    var hist = ScdStream.emptyHistory(s)
    splits.foreach { b =>
      hist = ScdStream.mergeBatch(hist,
        b.toDF("user_id", "us", "event_id", "status")).localCheckpoint(true)
    }
    assert(histSet(hist) === batchTruth(all))
    // the mid-run split really merged: user 1 run A has n_events=2
    val u1a = hist.filter(col("user_id") === 1 && col("run_id") === 1).head()
    assert(u1a.getAs[Long]("n_events") === 2L)
    // re-entry opened a separate current version, not a resurrected run 1
    val u1cur = hist.filter(col("user_id") === 1 && col("is_current")).head()
    assert(u1cur.getAs[String]("status") === "A" &&
      u1cur.getAs[Long]("run_id") === 3L)
  }

  test("same-microsecond adjacent runs merge identically to batch") {
    val s = spark; import s.implicits._
    // two different-status events in one truncated µs (the ADVICE r6 tie):
    // ordering is (us, event_id) in both engines
    val all = Seq((1L, 100L, 1L, "A"), (1L, 100L, 2L, "B"), (1L, 300L, 3L, "A"))
    val splits = Seq(all.take(1), all.drop(1))
    var hist = ScdStream.emptyHistory(s)
    splits.foreach { b =>
      hist = ScdStream.mergeBatch(hist,
        b.toDF("user_id", "us", "event_id", "status")).localCheckpoint(true)
    }
    assert(histSet(hist) === batchTruth(all))
  }

  test("foreachBatch streamed history over real events equals batch q71") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val stage = java.nio.file.Files.createTempDirectory("graft-scd-stream").toString
    val histPath = s"$stage/hist"
    // the full sf0.001 change stream, globally time-ordered (the
    // monotonic-ingest contract), split into 4 uneven micro-batches
    val ev = graft.Tables.load(s, sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_id"),
        col("event_type").as("status"))
      .orderBy(col("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = input.toDF().toDF("user_id", "us", "event_id", "status")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prior =
          if (new java.io.File(histPath).exists) s.read.parquet(histPath)
          else ScdStream.emptyHistory(s)
        // localCheckpoint pins the merge result before the overwrite
        // (read-modify-write on one path needs the read materialized)
        ScdStream.mergeBatch(prior, batch).localCheckpoint(true)
          .write.mode("overwrite").parquet(histPath)
        (): Unit
      }.start()
    try {
      val cuts = Seq(0, 137, 138, 600, ev.length)
      cuts.sliding(2).foreach { case Seq(a, b) =>
        input.addData(ev.slice(a, b): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = histSet(s.read.parquet(histPath))
    val batch = histSet(graft.operators.Scd.scd2HistoryFrom(
      ev.toSeq.toDF("user_id", "us", "event_id", "status")))
    assert(streamed === batch)
    assert(streamed.size > 500) // non-trivial history
  }
}
