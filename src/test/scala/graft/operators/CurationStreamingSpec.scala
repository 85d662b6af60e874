package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of the q59 curation funnel — the LLM pipeline's
  * production loop: the reference artifacts (near-dup flag set from the
  * previous pipeline run, the fixed eval benchmark's gram set) are
  * PERSISTED once; each micro-batch of incoming documents computes its
  * per-doc features, joins the artifacts, and appends partial funnel
  * sums. Because every flag is a per-doc function given the artifacts and
  * the 8 funnel aggregates are algebraic, the summed streamed report must
  * equal batch q59 over the same corpus bit-for-bit.
  */
class CurationStreamingSpec extends SparkSpec {

  test("foreachBatch curation over micro-batches equals batch q59") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    Curation.clearFeatureCache()

    val stage = java.nio.file.Files.createTempDirectory("graft-cur-stream").toString
    // ingest-time artifacts, persisted once:
    //  - dup flag set (previous run's clustering — metadata-sized)
    //  - eval gram set (fixed benchmark release — eval-sized)
    Dedup.sharedClusters(s, sf)
      .filter(col("cluster") =!= col("doc_id")).select(col("doc_id"))
      .write.parquet(s"$stage/dups")
    Curation.testGramSet(s, sf).write.parquet(s"$stage/test_grams")

    val docs = graft.Tables.load(s, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length > 100) // micro-batches below must be non-trivial

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val feats = Curation.docFeaturesOf(batch, passthrough = Seq("text"))
          .select(col("doc_id"), col("bucket"), col("n_tokens"),
            col("alpha_ratio"), col("text"))
        val dups = s.read.parquet(s"$stage/dups")
          .select(col("doc_id"), lit(true).as("is_dup"))
        // mirror batch q56's construction exactly: only the train/val
        // slice probes the eval gram set
        val contam = Curation.contaminationHits(
            feats.select(col("doc_id"), col("bucket"), col("text"))
              .filter(col("bucket") < 90),
            s.read.parquet(s"$stage/test_grams"))
          .select(col("doc_id"), lit(true).as("is_contam"))
        val flags = Curation.curationFlagsFrom(
          feats.drop("text"), dups, contam)
        flags.write.mode("append").parquet(s"$stage/flags")
        (): Unit
      }
      .start()
    try {
      // three uneven micro-batches, including a single-doc one
      input.addData(docs.take(150): _*)
      q.processAllAvailable()
      input.addData(docs.slice(150, 151): _*)
      q.processAllAvailable()
      input.addData(docs.drop(151): _*)
      q.processAllAvailable()
    } finally q.stop()

    // streamed flags == batch flags, doc by doc
    val streamedFlags = s.read.parquet(s"$stage/flags").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Boolean]("pq"), r.getAs[Boolean]("kept"),
        r.getAs[Boolean]("clean"))).toSet
    val batchFlags = Curation.curationFlags(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    assert(streamedFlags === batchFlags)

    // and the funnel report over the streamed flags == batch q59
    val streamedFunnel = Curation.funnelOf(s.read.parquet(s"$stage/flags"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val batchFunnel = Curation.curationFunnel(s, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(streamedFunnel.toSeq === batchFunnel.toSeq)
    // non-degenerate: monotone stages, attrition happens, survivors exist
    // (at sf0.001 every doc passes the quality stage — that stage's drop
    // is exercised by CurationSpec's q59 test at richer data)
    val byStage = batchFunnel.map(r => r._1 -> r._3).toMap
    assert(byStage(1) >= byStage(2) && byStage(2) >= byStage(3) &&
      byStage(3) >= byStage(4) && byStage(4) > 0 && byStage(4) < byStage(1))
  }
}
