package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q192 lifecycle twin (VERDICT r12 #6): the (buckets, clusters)
  * artifacts that `dupQualityLift` consumes are maintained per
  * micro-batch by [[DupQualityArtifactsStream]], and AFTER EVERY
  * REFRESH the artifact-fed q192 equals the self-computing q192 over
  * the same delivered corpus — including across a re-delivered batch.
  * The final refresh (full corpus delivered) must equal the registered
  * q192 query on the real sf dir row-for-row. */
class DupQualityArtifactsStreamSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[(String, Long, Long, Long)] =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("per-trigger artifact refresh: artifact-fed q192 == self-computing") {
    val s = spark
    val docs = graft.Tables.load(s, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint(true)
    val b1 = docs.filter(col("doc_id") % 5 < 1)
    val b2 = docs.filter(col("doc_id") % 5 >= 1 && col("doc_id") % 5 < 3)
    val b3 = docs.filter(col("doc_id") % 5 >= 3)
    val stage = java.nio.file.Files
      .createTempDirectory("graft-q192-stream").toString
    val buckets = s"$stage/buckets"; val clusters = s"$stage/clusters"

    var st = DupQualityArtifactsStream.empty(s)
    // b2 delivered twice: at-least-once re-delivery must be a no-op in
    // every sub-state (seen anti-joins) and in the published artifacts
    Seq(b1, b2, b2, b3).zipWithIndex.foreach { case (b, i) =>
      st = DupQualityArtifactsStream.mergeBatch(st, b)
      DupQualityArtifactsStream.refresh(s, st, buckets, clusters)
      // snapshot the delivered corpus as a testdata-shaped dir so the
      // self-computing run sees exactly what the artifacts describe
      val snap = s"$stage/snap$i"
      st.delivered.write.mode("overwrite").parquet(s"$snap/documents.parquet")
      val fed = rows(Dedup.dupQualityLift(s, snap,
        Some(buckets), Some(clusters)))
      val self = rows(Dedup.dupQualityLift(s, snap))
      assert(fed === self, s"trigger $i diverged")
      assert(fed.nonEmpty, s"trigger $i produced an empty contingency")
    }
    // full corpus delivered: the artifact-fed run must now equal the
    // registered q192 on the real sf dir
    val fedFinal = rows(Dedup.dupQualityLift(s, sf,
      Some(buckets), Some(clusters)))
    val selfFinal = rows(Dedup.dupQualityLift(s, sf))
    assert(fedFinal === selfFinal)
    // the fixture actually exercises both dup columns
    assert(fedFinal.exists(_._2 == 1L) && fedFinal.exists(_._2 == 0L),
      "contingency is missing a dup side — fixture vacuous")
  }
}
