package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental inverted-index maintenance — the streaming twin of q125
  * (`TextQueries.postingsIndex`): each micro-batch indexes ONLY its
  * genuinely-new documents and folds them into the maintained per-term
  * (df, capped postings) state. The deployment shape of a retrieval
  * layer: the corpus arrives continuously, the index must stay current,
  * and re-tokenizing the corpus per trigger (or on re-delivered batches)
  * is exactly what a 100 TB deployment cannot afford.
  *
  * Two state frames:
  *  - `indexed` (doc_id): which docs the index already covers. New work
  *    per trigger is `batch ANTI-JOIN indexed` — O(batch) tokenization,
  *    and a RE-DELIVERED batch contributes nothing (the at-least-once
  *    discipline shared with `Curation.refreshFeatureStore`).
  *  - `state` (term, df, postings array): df accumulates by SUM (each
  *    doc counted exactly once by the anti-join), postings merge by
  *    sorted-prefix union.
  *
  * The capped-prefix merge is EXACT, not approximate: any id the state
  * dropped from a term's prefix is larger than the prefix's maximum, so
  * it can never re-enter the true first-k of a grown set — first-k of
  * (first-k(A) ∪ B) equals first-k(A ∪ B) for append-only B. That is
  * why the state can stay vocabulary-sized (≤ k ids per term) while
  * remaining bit-equal to the batch index at every point.
  *
  * At 100 TB both frames bucket by their key (doc_id / term) so the
  * anti-join and the merge co-partition, and the per-trigger write goes
  * through [[VersionedState.applyBatch]] for replay transactionality.
  */
object IndexStream {

  /** Fold one micro-batch of (doc_id, text) into the index. Returns
    * (state', indexed'). */
  def mergeBatch(state: DataFrame, indexed: DataFrame, batch: DataFrame,
                 k: Int = 10): (DataFrame, DataFrame) = {
    val newDocs = batch
      .join(indexed, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val delta = newDocs
      .select(col("doc_id"),
        explode(graft.functions.Text.tokens(col("text"))).as("term"))
      .distinct()
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df_new"), collect_list(col("doc_id")).as("ids"))
    val empty = array().cast("array<bigint>")
    val state2 = state.join(delta, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("df_new"), lit(0L)))
          .as("df"),
        slice(array_sort(concat(coalesce(col("postings"), empty),
          coalesce(col("ids"), empty))), 1, k).as("postings"))
      .localCheckpoint(true)
    val indexed2 = indexed
      .unionByName(newDocs.select(col("doc_id")))
      .localCheckpoint(true)
    (state2, indexed2)
  }

  /** The q125 report off maintained state: df cut + the string render
    * (same minDf/format as the batch query, so equality is row-level). */
  def report(state: DataFrame, minDf: Long = 5L): DataFrame =
    state.filter(col("df") >= minDf)
      .select(col("term"), col("df"),
        expr("array_join(transform(postings, x -> CAST(x AS STRING)), ',')")
          .as("postings"))
      .orderBy(col("term"))

  def emptyState(s: SparkSession): DataFrame =
    s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("df",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("postings",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))))

  def emptyIndexed(s: SparkSession): DataFrame =
    s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
}
