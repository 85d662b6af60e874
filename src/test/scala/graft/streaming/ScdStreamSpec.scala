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

  private def batchTruthCdc(
      events: Seq[(Long, Long, Long, String, String)]): Set[_] = {
    val s = spark; import s.implicits._
    histSet(graft.operators.Scd.scd2HistoryCdcFrom(
      events.toDF("user_id", "us", "event_id", "status", "op")))
  }

  test("CDC tombstones across splits equal batch CDC construction") {
    val s = spark; import s.implicits._
    def u(uid: Long, us: Long, id: Long, st: String) = (uid, us, id, st, "u")
    def d(uid: Long, us: Long, id: Long) =
      (uid, us, id, null.asInstanceOf[String], "d")
    // user 1: tombstone ALONE in its batch closes the open run; re-insert
    //   at the SAME status opens a new version (delete breaks the run)
    // user 2: head-of-stream tombstone no-ops; double tombstone in one
    //   batch — only the first closes
    // user 3: delete + same-status re-open WITHIN one batch
    // user 4: full deletion, then an orphan tombstone in a LATER batch
    //   (no open row — no-op, and run ids must not collide), then
    //   re-insert in yet another batch
    val all = Seq(
      u(1, 100, 1, "A"), u(1, 200, 2, "A"), d(1, 300, 3), u(1, 400, 4, "A"),
      d(2, 110, 5), u(2, 210, 6, "B"), d(2, 310, 7), d(2, 320, 8),
      u(3, 130, 9, "C"), d(3, 230, 10), u(3, 260, 11, "C"),
      u(4, 140, 12, "D"), d(4, 240, 13), d(4, 340, 14), u(4, 440, 15, "D"))
    val byId = all.map(e => e._3 -> e).toMap
    val splits = Seq(
      Seq(1L, 2, 5, 9, 10, 11, 12).map(byId),   // batch 1
      Seq(3L, 6, 13).map(byId),                 // batch 2: lone tombstones
      Seq(4L, 7, 8, 14).map(byId),              // batch 3: re-insert + orphan
      Seq(15L).map(byId))                       // batch 4: post-delete insert
    var hist = ScdStream.emptyHistory(s)
    splits.foreach { b =>
      hist = ScdStream.mergeBatchCdc(hist,
        b.toDF("user_id", "us", "event_id", "status", "op"))
        .localCheckpoint(true)
    }
    assert(histSet(hist) === batchTruthCdc(all))
    // deletion intervals are real gaps: user 1 closed at the tombstone
    // (300), not at the successor's open (400)
    val u1closed = hist.filter(col("user_id") === 1 && !col("is_current")).head()
    assert(u1closed.getAs[Long]("valid_to") === 300L &&
      u1closed.getAs[Long]("n_events") === 2L)
    // user 2's double tombstone: closed at the FIRST (310), no current row
    val u2 = hist.filter(col("user_id") === 2).collect()
    assert(u2.length === 1 && u2.head.getAs[Long]("valid_to") === 310L)
    // user 4: orphan tombstone no-oped; re-insert got a FRESH run id
    val u4 = hist.filter(col("user_id") === 4).collect()
      .sortBy(_.getAs[Long]("valid_from"))
    assert(u4.map(_.getAs[Long]("run_id")).distinct.length === 2)
    assert(u4.last.getAs[Boolean]("is_current"))
  }

  test("foreachBatch CDC stream over real events equals batch q80") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val stage = java.nio.file.Files.createTempDirectory("graft-scd-cdc").toString
    val histPath = s"$stage/hist"
    val ev = graft.Tables.load(s, sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_id"),
        when(col("event_type") =!= "error", col("event_type")).as("status"),
        when(col("event_type") === "error", "d").otherwise("u").as("op"))
      .orderBy(col("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    val input = MemoryStream[(Long, Long, Long, String, String)]
    val q = input.toDF().toDF("user_id", "us", "event_id", "status", "op")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prior =
          if (new java.io.File(histPath).exists) s.read.parquet(histPath)
          else ScdStream.emptyHistory(s)
        ScdStream.mergeBatchCdc(prior, batch).localCheckpoint(true)
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
    val batch = batchTruthCdc(ev.toSeq)
    assert(streamed === batch)
    // tombstones really closed versions: some rows end at a deletion gap
    // (valid_to with no successor abutting it)
    assert(streamed.size > 100)
  }
}
