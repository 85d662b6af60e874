package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus snapshot diff — the streaming twin of q90
  * (`Curation.corpusDiff`): the live corpus is maintained from a CDC
  * stream of (doc_id, seq, h, deleted) upserts/tombstones, and at any
  * point the diff report against a frozen baseline snapshot is
  * re-derived from state. The deployment shape of a dataset-release
  * audit: the baseline is the last promoted release, the stream is the
  * curation pipeline's ongoing writes, and the report is the promotion
  * gate's added/removed/changed/unchanged panel.
  *
  * State is (doc_id, seq, h, deleted) — latest version per doc by `seq`
  * (the CDC log offset; (doc_id, seq) unique by contract, same contract
  * as ScdStream's change stream). Tombstones stay in state as deleted
  * markers so a late-arriving LOWER-seq update cannot resurrect a
  * removed doc.
  *
  * Scale shape: per-batch work is one batch-local max_by reduce plus a
  * doc_id-keyed merge against state — O(state + batch) with only hashes
  * on the wire, never text (the q90 invariant). At 100 TB the state
  * table is bucketed by doc_id so the merge co-partitions, and the
  * exactly-once write goes through [[VersionedState.applyBatch]] — the
  * replay of an uncommitted micro-batch must not double-apply (max_by
  * makes RE-DELIVERED events idempotent, but the versioned commit is
  * what makes the merge transactional under restart).
  */
object DiffStream {

  /** Latest-wins reduce of one CDC batch: one row per doc at max seq. */
  private def batchLatest(batch: DataFrame): DataFrame =
    batch.groupBy(col("doc_id"))
      .agg(max_by(struct(col("h"), col("deleted")), col("seq")).as("x"),
        max(col("seq")).as("seq"))
      .select(col("doc_id"), col("seq"), col("x.h").as("h"),
        col("x.deleted").as("deleted"))

  /** Merge a CDC batch into the live-corpus state (latest version per
    * doc across state ∪ batch). */
  def mergeBatch(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batchLatest(batch))
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("h"), col("deleted")), col("seq")).as("x"),
        max(col("seq")).as("seq"))
      .select(col("doc_id"), col("seq"), col("x.h").as("h"),
        col("x.deleted").as("deleted"))

  /** The diff report off maintained state — identical final stage to
    * batch q90. `baseline` is (doc_id, h_old). */
  def report(baseline: DataFrame, state: DataFrame): DataFrame =
    graft.operators.Curation.diffClasses(
      baseline,
      state.filter(!col("deleted"))
        .select(col("doc_id"), col("h").as("h_new")))

  def emptyState(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("seq", LongType), StructField("h", LongType),
        StructField("deleted", BooleanType))))
  }
}
