package graft.operators

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of q67's incremental dedup — the production loop: the
  * reference corpus's dedup artifacts (fingerprints, shingle hashes, LSH
  * band rows) are PERSISTED once, then each micro-batch of incoming docs
  * is flagged against those artifacts alone. Per-batch work touches only
  * the batch (a doc never spans batches, so its shingles/signature are
  * batch-complete); the reference side is never re-shingled. The streamed
  * flag set must equal the batch `Dedup.incrementalDedup` over the same
  * corpus laid out as a documents table.
  */
class IncrementalDedupStreamingSpec extends SparkSpec {

  private def fp(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(array_join(Text.tokens(col("text")), " ")).as("f"))

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Text.tokens(col("text")).as("toks"))

  test("per-batch flags against persisted reference artifacts == batch q67") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // reference corpus = even doc_ids; incoming = odd, across 2 batches
    val reference = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "one two three four five six seven eight"),
      (6L, "unrelated reference corpus entry words live here fine"))
    val incoming = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"), // near dup of 2
      (5L, "one two three four five six seven eight"),            // exact dup of 4
      (7L, "completely different text nothing shared with any reference"),
      (9L, "alpha beta gamma delta epsilon zeta eta theta"))      // exact-token dup of 2
    val stage = java.nio.file.Files.createTempDirectory("graft-inc-dedup").toString

    // ingest-time artifacts: pay the reference side once, reuse per batch
    val refDf = reference.toDF("doc_id", "text")
    fp(refDf).write.parquet(s"$stage/ref_fp")
    val refShingles = Dedup.shingleHashes(toks(refDf))
    refShingles.write.parquet(s"$stage/ref_shingles")
    Dedup.lshBandRows(refShingles).write.parquet(s"$stage/ref_bands")
    refShingles.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .write.parquet(s"$stage/ref_cnt")

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // exact: batch fingerprints against the persisted reference set
        val exact = fp(batch).as("i")
          .join(s.read.parquet(s"$stage/ref_fp").as("r"), col("i.f") === col("r.f"))
          .select(col("i.doc_id").as("doc_id"), col("r.doc_id").as("ref_id"))
          .groupBy(col("doc_id")).agg(min(col("ref_id")).as("dup_of"))
          .withColumn("reason", lit("exact"))
        // near: batch band rows against the persisted reference bands,
        // verified by a shingle join against the persisted reference hashes
        val incSh = Dedup.shingleHashes(toks(batch)).persist()
        val cand = Dedup.lshBandRows(incSh).as("a")
          .join(s.read.parquet(s"$stage/ref_bands").as("b"),
            col("a.band_id") === col("b.band_id") &&
            col("a.band_hash") === col("b.band_hash"))
          .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("ref_id"))
          .distinct()
        val shared = cand
          .join(incSh.select(col("doc_id"), col("h")), "doc_id")
          .join(s.read.parquet(s"$stage/ref_shingles")
            .select(col("doc_id").as("ref_id"), col("h")), Seq("ref_id", "h"))
          .groupBy(col("doc_id"), col("ref_id")).agg(count(lit(1)).as("shared"))
        val near = shared
          .join(incSh.groupBy(col("doc_id")).agg(count(lit(1)).as("na")), "doc_id")
          .join(s.read.parquet(s"$stage/ref_cnt")
            .select(col("doc_id").as("ref_id"), col("n").as("nb")), "ref_id")
          .filter(col("shared").cast("double") /
            (col("na") + col("nb") - col("shared")).cast("double") >= 0.3)
          .groupBy(col("doc_id")).agg(min(col("ref_id")).as("dup_of"))
          .withColumn("reason", lit("near"))
        exact.unionByName(
            near.join(exact.select(col("doc_id")), Seq("doc_id"), "left_anti"))
          .write.mode("append").parquet(s"$stage/flags")
        incSh.unpersist()
        (): Unit
      }
      .start()
    try {
      input.addData(incoming.take(2): _*)
      q.processAllAvailable()
      input.addData(incoming.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    // batch ground truth over the same corpus written as a documents table
    val corpusDir = java.nio.file.Files.createTempDirectory("graft-inc-corpus").toString
    (reference ++ incoming).toDF("doc_id", "text")
      .write.parquet(s"$corpusDir/documents.parquet")
    val batchFlags = Dedup.incrementalDedup(s, corpusDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    val streamed = s.read.parquet(s"$stage/flags").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"),
        r.getAs[String]("reason"))).toSet
    assert(streamed === batchFlags)
    // the fixture exercises both reasons and leaves the clean doc unflagged
    assert(streamed.exists(_._3 == "exact") && streamed.exists(_._3 == "near"))
    assert(!streamed.exists(_._1 == 7L))
  }
}
