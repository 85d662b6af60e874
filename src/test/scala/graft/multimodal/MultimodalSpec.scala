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

  test("resize and frame-sample stubs: deterministic, size-correct, distributed") {
    val payload = (0 until 1000).map(_.toByte).toArray
    assert(Multimodal.resizeStub(payload, 10, 10).length === 100)
    assert(Multimodal.resizeStub(payload, 100, 100).length === 1000) // capped at source
    val frames = Multimodal.frameSampleStub(payload, 4)
    assert(frames.length === 4 && frames.map(_.length).sum === 1000)
    val rows = Multimodal.sampleFrames(spark, sf, n = 4).collect()
    assert(rows.groupBy(_.doc_id).forall(_._2.length == 4))
    assert(rows.forall(_.frame_bytes > 0))
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
