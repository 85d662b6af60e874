package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Similarity

/** Incremental maintenance for the ANN index family — the streaming twin
  * of the q31/q128/q129 index builds, closing the one production loop the
  * vector surface lacked (VERDICT r13 #1): in deployment the corpus
  * arrives continuously, and re-training codebooks plus re-coding the
  * whole corpus per trigger is exactly what a 100 TB retrieval layer
  * cannot afford. The reference's analogue is the dim-store upsert loop
  * (`gmall-realtime/.../func/DimSink.java:43-91`): a frozen-schema store
  * maintained incrementally per batch, with idempotent re-delivery.
  *
  * Discipline (the [[IndexStream]] shape applied to vectors):
  *
  *  - **Codebooks are FROZEN.** The coarse IVF centroids and the PQ
  *    codebooks ([[Similarity.ivfCentroids]] / [[Similarity.pqBooks]])
  *    are trained once from the historical corpus and broadcast to every
  *    micro-batch; per-trigger work is a pure broadcast PROBE of the new
  *    vectors against them — O(batch × nCells) and O(batch × m ×
  *    codebookSize) flops, never corpus-proportional. Assignment is the
  *    same deterministic argmax the batch pipeline runs
  *    ([[Similarity.assignCells]] / [[Similarity.pqAssign]] as pure
  *    functions of the codebook state), so the maintained artifacts are
  *    BIT-EQUAL to a batch rebuild at every commit point.
  *  - **Re-delivery is a no-op twice over**: the `seen` anti-join makes a
  *    replayed vector contribute nothing, and the whole merge rides
  *    [[VersionedState.applyBatchMulti]] so a replayed batchId never
  *    even runs (the crash-replay contract every twin here shares).
  *  - **Retraining is GATED, not scheduled**: [[driftReport]] compares
  *    each cell's running exact member mean against its frozen centroid
  *    (q169's decimal-sum construction, `Similarity.labelCentroidDrift` —
  *    order-free, so the report is identical however batches were
  *    split). When [[needsRetrain]] trips, the operator retrains
  *    codebooks offline (the batch q31/q128 jobs) and restarts the twin
  *    on a fresh state dir — the q67 epoch discipline.
  *
  * State frames (committed atomically per batch behind one `_COMMIT`):
  *  - `seen`      (vec_id)            — membership for the anti-join;
  *  - `cells`     (vec_id, cid)       — the coarse inverted file;
  *  - `codes`     (vec_id, ss, cid)   — the PQ code companion column;
  *  - `cellstats` (cid, pos, s, n)    — exact per-cell decimal component
  *    sums + member counts feeding the drift report. Metadata-scale
  *    (nCells × dims rows) however large the corpus grows.
  *
  * At 100 TB `seen`/`cells`/`codes` bucket by vec_id so the anti-join and
  * every retrieval join-back co-partition ([[graft.sinks.Warehouse]]'s
  * layout); `cellstats` merges map-side (it aggregates to nCells × 64
  * rows before the exchange). Retrieval over the maintained artifacts is
  * [[Similarity.ivfPqTopKFrom]] — the identical plan q129 runs over its
  * batch-built index, proven hash-equal in VectorIndexStreamSpec.
  */
object VectorIndexStream {

  val frameNames: Seq[String] = Seq("seen", "cells", "codes", "cellstats")

  def emptyState(s: SparkSession): Map[String, DataFrame] = {
    def empty(ddl: String) = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
    Map(
      "seen" -> empty("vec_id BIGINT"),
      "cells" -> empty("vec_id BIGINT, cid BIGINT"),
      "codes" -> empty("vec_id BIGINT, ss INT, cid BIGINT"),
      "cellstats" -> empty(
        "cid BIGINT, pos INT, s DECIMAL(38,7), n BIGINT"))
  }

  /** Fold one micro-batch of (vec_id, embedding) into the index against
    * FROZEN `cents`/`books`. Pure function of (state, batch, codebooks):
    * the spec proves streamed == batch-built over uneven splits. */
  def mergeBatch(s: SparkSession, state: Map[String, DataFrame],
                 batch: DataFrame, cents: DataFrame, books: DataFrame,
                 m: Int = 4): Map[String, DataFrame] = {
    // O(batch) new work per trigger; a re-delivered vector is dropped
    // here (at-least-once safety on top of the versioned transaction).
    // dropDuplicates first: vec_id is the key by contract, but an
    // at-least-once SOURCE can repeat a vector WITHIN one batch, and a
    // duplicate would survive the anti-join, re-enter through
    // assignCells' join-back, and double-count the cell's drift sums.
    val newVecs = batch
      .dropDuplicates("vec_id")
      .join(state("seen"), Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    val assigned = Similarity.assignCells(s, newVecs, cents)
    val codesDelta = Similarity.pqAssign(
      s, Similarity.pqSubs(newVecs, m, 64 / m), books)
    // exact decimal component sums (the lloydStep construction): order-
    // free, so cellstats is independent of how the corpus was batched
    val statsDelta = assigned
      .select(col("cid"), posexplode(col("embedding")))
      .groupBy(col("cid"), (col("pos") + 1).as("pos"))
      .agg(sum(col("col").cast("decimal(27,7)")).cast("decimal(38,7)")
        .as("s"), count(lit(1)).as("n"))
    Map(
      "seen" -> state("seen").unionByName(newVecs.select(col("vec_id"))),
      "cells" -> state("cells")
        .unionByName(assigned.select(col("vec_id"), col("cid"))),
      "codes" -> state("codes").unionByName(codesDelta),
      "cellstats" -> state("cellstats").unionByName(statsDelta)
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("s")).cast("decimal(38,7)").as("s"),
          sum(col("n")).as("n")))
  }

  /** Run the maintenance loop over a streaming (vec_id, embedding)
    * source: one [[VersionedState.applyBatchMulti]] transaction per
    * micro-batch. `cents`/`books` are the frozen (pinned, metadata-
    * sized) codebook frames. */
  def run(s: SparkSession, source: DataFrame, stateDir: String,
          checkpoint: String, cents: DataFrame, books: DataFrame,
          m: Int = 4): StreamingQuery =
    source.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      VersionedState.applyBatchMulti(s, stateDir, id, b, frameNames,
        emptyState(s),
        (st, bt) => mergeBatch(s, st, bt, cents, books, m))
      (): Unit
    }.option("checkpointLocation", checkpoint).start()

  /** Latest committed index artifacts (empty frames before the first
    * commit). */
  def readArtifacts(s: SparkSession,
                    stateDir: String): Map[String, DataFrame] =
    VersionedState.readMulti(s, stateDir, frameNames, emptyState(s))

  /** Per-cell centroid drift: cosine between the FROZEN centroid and the
    * cell's running exact member mean (q169's construction — decimal
    * sums make it independent of batch split and partition order).
    * Output: (cid, n_members, drift_cos), one row per cell that has
    * members. */
  def driftReport(cellstats: DataFrame, cents: DataFrame): DataFrame = {
    val mean = cellstats.groupBy(col("cid"))
      .agg(max(col("n")).as("n_members"),
        transform(array_sort(collect_list(struct(col("pos"),
          (col("s") / col("n")).cast("double").as("comp")))),
          x => x.getField("comp")).as("mv"))
    mean.join(cents, "cid")
      .select(col("cid"), col("n_members"),
        round(Similarity.cosine(col("ce"), col("mv")), 6).as("drift_cos"))
      .orderBy(col("cid"))
  }

  /** The retrain gate: true when any populated cell's member mean has
    * drifted below `minCos` cosine to its frozen centroid. On true, the
    * operator retrains codebooks offline and restarts the twin on a
    * fresh epoch dir; the maintained artifacts stay serviceable (and
    * bit-correct for THEIR codebooks) until the cutover. */
  def needsRetrain(cellstats: DataFrame, cents: DataFrame,
                   minCos: Double = 0.9): Boolean =
    driftReport(cellstats, cents)
      .filter(col("drift_cos") < minCos).limit(1).count() > 0
}
