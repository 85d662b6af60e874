package graft.operators

import graft.SparkSpec

/** q186 filtered-ANN audit: driver-side brute-force recompute of both
  * filter strategies and the prefix property the recall metric rests on. */
class FilteredAnnSpec extends SparkSpec {

  private val (nQ, k) = (5, 10)

  private def cos6(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("q186: pool, survivors, and recall match brute-force recompute") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2).toLong))
    val expected = vecs.filter(_._1 < nQ).map { case (qid, qe, ql) =>
      val scored = vecs.filter(_._1 != qid)
        .map { case (nid, ne, nl) => (nid, nl, cos6(qe, ne)) }
        .sortBy { case (nid, _, s) => (-s, nid) }
      val pool = scored.count(_._2 == ql).toLong
      val preK = math.min(pool, k.toLong)
      val postIds = scored.take(k).filter(_._2 == ql).map(_._1)
      val preIds = scored.filter(_._2 == ql).take(k).map(_._1)
      // the prefix property the ppm metric rests on
      assert(preIds.take(postIds.length).toSeq === postIds.toSeq,
        s"post-filter survivors not a prefix of filtered top-k (qid $qid)")
      qid -> (ql, pool, preK, postIds.length.toLong,
        if (preK == 0) 0L else postIds.length * 1000000L / preK)
    }.toMap
    val rows = Similarity.filteredTopK(spark, sf).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (ql, pool, preK, surv, ppm) = expected(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) === ((ql, pool, preK, surv, ppm)),
        s"qid ${r.getLong(0)}")
    }
    // fixture adequacy: post-filtering must lose something somewhere,
    // or the audit cannot distinguish the strategies
    assert(rows.exists(r => r.getLong(5) < 1000000L),
      "post-filter recall perfect everywhere — fixture degenerate")
  }
}
