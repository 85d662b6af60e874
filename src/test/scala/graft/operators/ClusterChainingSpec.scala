package graft.operators

import graft.SparkSpec

/** q189 cluster-chaining audit: structural invariants on the corpus plus a
  * planted 5-doc transitive chain whose endpoint pair sits below the 0.3
  * pairwise bar. */
class ClusterChainingSpec extends SparkSpec {

  test("q189: pair-count algebra holds and 2-clusters are never chained") {
    val rows = Dedup.clusterChaining(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, nc, np, mj, cp) =>
      assert(b >= 2 && b <= 5, s"bucket $b out of range")
      assert(mj >= 0 && mj <= 1000000)
      assert(cp >= 0 && cp <= 1000000)
      // below the m=8 sample cap every member is sampled: C(b,2) per cluster
      if (b < 5) assert(np === nc * b * (b - 1) / 2, s"bucket $b pair count")
      else assert(np >= nc * 10 && np <= nc * 28, s"bucket 5+ pair bounds")
    }
    rows.find(_._1 == 2L).foreach { case (_, _, _, mj, cp) =>
      assert(cp === 0L, "a 2-cluster's only pair IS its verified >=0.3 edge")
      assert(mj >= 300000L)
    }
  }

  test("q189: planted 5-doc chain clusters whole, endpoint pair is chained") {
    import spark.implicits._
    // 72-token docs shifted by 10: adjacent J = 60/80 = 0.75 (verified
    // edges), endpoints J = 30/110 = 0.27 < 0.3 — in the cluster only by
    // transitivity
    val words = (1 to 112).map(i => f"w$i%03d")
    def doc(off: Int): String = words.slice(off, off + 72).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("chain189").toString
    (0 until 5).map(i => (i.toLong + 1, "s", doc(10 * i)))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.clusterChaining(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 5L, "size bucket")
    assert(r.getLong(1) === 1L, "one cluster")
    assert(r.getLong(2) === 10L, "C(5,2) sampled pairs")
    assert(r.getLong(4) >= 100000L, "endpoint pair must read as chained")
  }
}
