package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q192 lifecycle loop (VERDICT r12 #6): [[graft.operators.Dedup.dupQualityLift]]
  * reads two persisted artifacts — the q188 per-doc perplexity-tercile
  * table and the q48 cluster labeling — but until this twin their only
  * producer was the one-shot batch [[graft.operators.Dedup.writeDupQualityArtifacts]].
  * This object maintains BOTH artifacts incrementally (the q67 persisted-
  * artifact discipline): each micro-batch of documents folds into
  *
  *  - the [[PplModelStream]] state (bigram counts + train vocab + seen) —
  *    merge-by-sum, re-delivery absorbed by the seen anti-join;
  *  - the [[EffectiveSizeStream]] state (shingle hashes + LSH bands +
  *    component-min labels) — new docs probe the full band index, so a
  *    pair is discovered exactly once, and label contraction keeps every
  *    doc labeled with its component minimum (the q48 convention);
  *  - the delivered-docs frame (the corpus the artifacts describe).
  *
  * `refresh` then REPUBLISHES both artifacts for the delivered corpus:
  * buckets re-rank because terciles are global ranks (a new doc can move
  * every threshold — the honest part of incremental quality scoring),
  * clusters come straight off the maintained labels. The spec proves the
  * artifact-fed q192 equals the self-computing one after EVERY refresh,
  * not just the last. At 100 TB the states are the artifact pipeline's
  * own tables (bigram counts are vocab²-bounded, hashes/bands/labels are
  * per-doc compact rows) and `refresh` is the scheduled republish job.
  */
object DupQualityArtifactsStream {

  /** (pplBigrams, pplVocab, pplSeen, hashes, bands, labels, delivered). */
  final case class State(bc: DataFrame, tv: DataFrame, seen: DataFrame,
                         hashes: DataFrame, bands: DataFrame,
                         labels: DataFrame, delivered: DataFrame)

  def empty(s: SparkSession): State = State(
    PplModelStream.emptyBc(s), PplModelStream.emptyTv(s),
    TextStatsStream.emptySeen(s),
    EffectiveSizeStream.emptyHashes(s), EffectiveSizeStream.emptyBands(s),
    EffectiveSizeStream.emptyLabels(s),
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, source STRING, text STRING")))

  /** Fold one micro-batch of (doc_id, source, text). Re-delivered docs
    * are absorbed by each sub-state's own seen set; the delivered frame
    * dedups by doc_id. */
  def mergeBatch(st: State, batch: DataFrame): State = {
    val (bc2, tv2, seen2) =
      PplModelStream.mergeBatch(st.bc, st.tv, st.seen, batch)
    val (h2, b2, l2) = EffectiveSizeStream.mergeBatch(
      st.hashes, st.bands, st.labels,
      batch.select(col("doc_id"), col("text")))
    val fresh = batch.join(st.delivered.select(col("doc_id")),
      Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("text"))
    val delivered2 = st.delivered.unionByName(fresh).localCheckpoint(true)
    State(bc2, tv2, seen2, h2, b2, l2, delivered2)
  }

  /** Republish both artifacts for the delivered corpus — the shapes
    * [[graft.operators.Dedup.dupQualityLift]] consumes via its
    * (bucketsDir, clustersDir) parameters. */
  def refresh(s: SparkSession, st: State,
              bucketsOut: String, clustersOut: String): Unit = {
    import graft.functions.Text
    val scoredBg = st.delivered
      .select(col("doc_id"), col("source"),
        Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("doc_id"), col("source"),
        col("g.w1").as("w1"), col("g.w2").as("w2"))
    graft.operators.TextQueries.pplDocBucketsFrom(
        st.bc.select(col("w1"), col("w2"), col("c_ab")),
        st.tv.agg(count(lit(1)).as("v")), scoredBg)
      .write.mode("overwrite").parquet(bucketsOut)
    st.labels.select(col("doc_id"), col("lbl").as("cluster"))
      .write.mode("overwrite").parquet(clustersOut)
  }
}
