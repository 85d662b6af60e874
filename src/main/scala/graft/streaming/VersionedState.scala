package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Transactional versioned state for foreachBatch merges — the
  * exactly-once guard the parquet read-modify-write twins (ScdStream,
  * RollingStream, the dedup/feature stores) need under Spark's restart
  * contract: after a crash, Structured Streaming REPLAYS the last
  * uncommitted micro-batch with the SAME batchId, so an unguarded
  * `merge + overwrite` applies it twice (counts double, runs extend
  * twice). The reference leans on Phoenix upsert idempotence for the
  * same problem (DimSink.java:43-91); sum/extend merges are not
  * idempotent, so they need the batchId transaction instead.
  *
  * Protocol (the classic batchId-versioned-directory pattern):
  *  - state for batch b is written under `path/v=b` — a NEW directory,
  *    never touching the previous version;
  *  - a version is readable only once its `_SUCCESS` marker exists
  *    (written by Spark after the parquet commit);
  *  - `latest(path)` resolves the highest complete version;
  *  - on batch b, a caller that sees latest >= b SKIPS the merge (the
  *    batch was fully applied before the crash); a half-written `v=b`
  *    without `_SUCCESS` is invisible and simply overwritten by the
  *    replay, which re-merges from the intact previous version;
  *  - versions older than the previous one are pruned opportunistically
  *    (two survivors bound the storage while keeping the crash-recovery
  *    parent alive).
  *
  * At 100 TB the same protocol holds with a manifest instead of
  * directory listing; the state write is the incremental O(batch) delta
  * the individual twins already guarantee. */
object VersionedState {

  private def fs(s: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Highest complete (committed) version id under `path`, if any. */
  def latestVersion(s: SparkSession, path: String): Option[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val f = fs(s, path)
    if (!f.exists(root)) return None
    val versions = f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filter(p => f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("v=").toLong)
    if (versions.isEmpty) None else Some(versions.max)
  }

  /** The latest committed state frame, or `empty` if none. */
  def read(s: SparkSession, path: String, empty: => DataFrame): DataFrame =
    latestVersion(s, path) match {
      case Some(v) => s.read.parquet(s"$path/v=$v")
      case None    => empty
    }

  /** Apply `merge(prior, batch)` for `batchId` exactly once: a replayed
    * batchId (<= latest committed version) is a no-op; a fresh one
    * merges against the latest version and commits `v=batchId`.
    * Returns true when the merge ran, false when it was skipped. */
  def applyBatch(s: SparkSession, path: String, batchId: Long,
                 batch: DataFrame, empty: => DataFrame,
                 merge: (DataFrame, DataFrame) => DataFrame): Boolean = {
    val latest = latestVersion(s, path)
    if (latest.exists(_ >= batchId)) return false
    val prior = latest match {
      case Some(v) => s.read.parquet(s"$path/v=$v")
      case None    => empty
    }
    // localCheckpoint pins the read before any write below the same root
    merge(prior, batch).localCheckpoint(true)
      .write.mode("overwrite").parquet(s"$path/v=$batchId")
    // prune everything older than the direct parent (crash between the
    // commit above and this prune only leaves extra history, never loss)
    val f = fs(s, path)
    latestVersion(s, path).foreach { cur =>
      val keep = Set(cur) ++ latest
      f.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
        .map(_.getPath).filter(_.getName.startsWith("v="))
        .filter(p => !keep.contains(p.getName.stripPrefix("v=").toLong))
        .foreach(p => f.delete(p, true))
    }
    true
  }
}
