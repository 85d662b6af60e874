package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once semantics for the foreachBatch state twins: Spark
  * replays the last uncommitted micro-batch with the SAME batchId after
  * a restart, so the versioned store must (a) no-op on an already-
  * committed batchId, (b) recover cleanly when a crash left a
  * half-written version, (c) still produce histories identical to the
  * batch construction. */
class VersionedStateSpec extends SparkSpec {

  private def histSet(df: DataFrame) = df.collect().map(r =>
    (r.getAs[Long]("user_id"), r.getAs[String]("status"),
      r.getAs[Long]("valid_from"), Option(r.getAs[Any]("valid_to")),
      r.getAs[Long]("n_events"), r.getAs[Boolean]("is_current"),
      r.getAs[Long]("run_id"))).toSet

  test("replayed batchId is a no-op; crash-replay recovers; result equals batch") {
    val s = spark
    import s.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-vstate").toString + "/scd"
    val all = Seq(
      (1L, 100L, 1L, "A"), (1L, 200L, 2L, "A"), (1L, 300L, 3L, "B"),
      (2L, 110L, 4L, "C"), (2L, 210L, 5L, "C"), (3L, 320L, 6L, "X"))
    val batches = Seq(all.take(2), all.slice(2, 4), all.drop(4))
    def df(b: Seq[(Long, Long, Long, String)]) =
      b.toDF("user_id", "us", "event_id", "status")
    def apply(id: Long, b: Seq[(Long, Long, Long, String)]): Boolean =
      VersionedState.applyBatch(s, path, id, df(b),
        ScdStream.emptyHistory(s), ScdStream.mergeBatch)

    assert(apply(0, batches(0)))
    assert(apply(1, batches(1)))
    val afterTwo = histSet(VersionedState.read(s, path,
      ScdStream.emptyHistory(s)))
    // restart replay: batch 1 arrives AGAIN with the same id — without
    // the guard, user 1's run A would double its n_events
    assert(!apply(1, batches(1)))
    assert(histSet(VersionedState.read(s, path,
      ScdStream.emptyHistory(s))) === afterTwo)

    // crash mid-write: a half-written v=2 with no _SUCCESS marker must
    // be invisible, and the replay of batch 2 must land on top of v=1
    val half = new java.io.File(s"$path/v=2")
    half.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/v=2/part-garbage.parquet"), "junk")
    assert(VersionedState.latestVersion(s, path) === Some(1L))
    assert(apply(2, batches(2)))

    val streamed = histSet(VersionedState.read(s, path,
      ScdStream.emptyHistory(s)))
    val batch = histSet(graft.operators.Scd.scd2HistoryFrom(df(all)))
    assert(streamed === batch)
    // pruning keeps at most the current version and its parent
    val vs = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("v=")).sorted
    assert(vs.length <= 2 && vs.contains("v=2"))
  }
}
