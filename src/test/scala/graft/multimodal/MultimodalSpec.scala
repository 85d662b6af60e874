package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binary payload plumbing: schema, byte counts, deterministic stub features") {
    val feats = Multimodal.extractFeatures(spark, sf, dim = 8).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(f => f.n_bytes > 0))
    // deterministic across evaluations
    val again = Multimodal.extractFeatures(spark, sf, dim = 8).collect()
    assert(feats.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (x, y) => x.features.sameElements(y.features) })
  }

  test("media stats match text byte lengths") {
    val s = spark
    import org.apache.spark.sql.functions._
    val stats = Multimodal.mediaStats(s, sf)
    val docs = graft.Tables.load(s, sf, "documents")
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("expect"))
    val joined = stats.join(docs, "doc_id")
      .filter(col("n_bytes") =!= col("expect"))
    assert(joined.count() === 0)
  }
}
