package graft.streaming

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental corpus diff (the q90 twin): a CDC stream of doc
  * upserts/tombstones maintains the live-corpus state through
  * VersionedState exactly-once merges; the report re-derived from state
  * must equal batch q90 — including updates whose seq order is INVERTED
  * across micro-batches (latest-wins must hold globally, not per batch),
  * tombstoned docs that later see a re-delivered stale update (must stay
  * removed), and wholesale re-delivery of a batch (max_by idempotence).
  */
class DiffStreamSpec extends SparkSpec {

  test("foreachBatch CDC diff over documents equals batch q90") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-diffstate").toString + "/state"

    // per-doc hashes of the original and the two revisions, precomputed
    // with the SAME h60 the batch query uses
    val d = graft.Tables.load(s, sf, "documents")
      .select(col("doc_id"), expr("doc_id % 100").as("m"),
        PortableHash.h60(col("text")).as("h0"),
        PortableHash.h60(concat(col("text"), lit(" rev1"))).as("h1"),
        PortableHash.h60(concat(col("text"), lit(" rev2"))).as("h2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(d.map(_._2).distinct.length === 100,
      "fixture must populate every doc_id%100 class")

    // q90's snapshot conventions as CDC events (doc_id, seq, h, deleted):
    // initial load = prev snapshot (m<90); then the release's changes
    val inits      = d.filter(_._2 < 90).map(x => (x._1, 0L, x._3, false))
    val inserts    = d.filter(_._2 >= 90).map(x => (x._1, 1L, x._3, false))
    val rev2       = d.filter(x => x._2 >= 40 && x._2 <= 49)
      .map(x => (x._1, 3L, x._5, false))          // final revision...
    val rev1Late   = d.filter(x => x._2 >= 40 && x._2 <= 49)
      .map(x => (x._1, 2L, x._4, false))          // ...its STALE precursor,
                                                  // delivered a batch later
    val tombstones = d.filter(_._2 < 10).map(x => (x._1, 5L, 0L, true))
    val staleResend = inits.filter(x => d.exists(y => y._1 == x._1 && y._2 < 10))

    val input = MemoryStream[(Long, Long, Long, Boolean)]
    val q = input.toDF().toDF("doc_id", "seq", "h", "deleted").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        VersionedState.applyBatch(s, statePath, batchId, batch,
          DiffStream.emptyState(s), DiffStream.mergeBatch)
        (): Unit
      }.start()
    try {
      Seq(inits,                     // the promoted release loads
        inserts ++ rev2,             // new docs + final revisions
        rev1Late ++ tombstones,      // stale lower-seq revisions + deletes
        staleResend                  // re-delivered pre-tombstone rows
      ).foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()

    val baseline = s.createDataFrame(
        d.filter(_._2 < 90).map(x => (x._1, x._3)).toSeq)
      .toDF("doc_id", "h_old")
    val state = VersionedState.read(s, statePath, DiffStream.emptyState(s))
    val streamed = DiffStream.report(baseline, state).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = graft.operators.Curation.corpusDiff(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed === batch)
    assert(streamed.map(_._1) ===
      Set("added", "removed", "changed", "unchanged"))

    // the stale rev1 must not have won anywhere: no live doc carries h1
    val h1s = d.filter(x => x._2 >= 40 && x._2 <= 49).map(_._4).toSet
    assert(state.filter(!col("deleted")).collect()
      .forall(r => !h1s.contains(r.getAs[Long]("h"))),
      "a stale lower-seq revision overwrote the final one")
  }
}
