package graft.operators

import graft.SparkSpec

/** q185 cluster purity: full driver-side re-implementation of the
  * deterministic Lloyd construction (round-6 cosine assignment with cid
  * tiebreak, decimal-exact member means) and the purity report. */
class ClusterPuritySpec extends SparkSpec {

  private val nCells = 16
  private val rounds = 2

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

  test("q185: clusters, majority labels, and tightness match recompute") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getInt(2).toLong))
    def assign(cents: Seq[(Long, Array[Float])]): Map[Long, Long] =
      vecs.map { case (id, e, _) =>
        val best = cents.map { case (cid, ce) =>
          (math.round(cos6(e, ce) * 1000000d), cid)
        }.minBy { case (micro, cid) => (-micro, cid) }._2
        (id, best)
      }.toMap
    def lloyd(asg: Map[Long, Long]): Seq[(Long, Array[Float])] =
      vecs.groupBy(v => asg(v._1)).toSeq.map { case (cid, ms) =>
        val dims = ms.head._2.length
        val ce = (0 until dims).map { d =>
          val s = ms.map(m => BigDecimal(m._2(d).toDouble)
            .setScale(7, BigDecimal.RoundingMode.HALF_UP))
            .foldLeft(BigDecimal(0))(_ + _)
          (s.toDouble / ms.length).toFloat
        }.toArray
        (cid, ce)
      }
    var cents = vecs.filter(_._1 < nCells)
      .map(v => (v._1, v._2)).toSeq
    for (_ <- 1 to rounds) cents = lloyd(assign(cents))
    val asg = assign(cents)
    val centMap = cents.toMap
    val expected = vecs.groupBy(v => asg(v._1)).map { case (cid, ms) =>
      val byLabel = ms.groupBy(_._3).map { case (l, xs) => (l, xs.length.toLong) }
      val (topL, topC) = byLabel.toSeq.minBy { case (l, c) => (-c, l) }
      val ssim = ms.map(m => BigDecimal(cos6(m._2, centMap(cid)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _)
      cid -> (ms.length.toLong, topL, topC * 1000000L / ms.length,
        BigDecimal(ssim.toDouble / ms.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val rows = Similarity.clusterPurity(spark, sf).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (n, tl, ppm, mc) = expected(r.getLong(0))
      assert(r.getLong(1) === n, s"n_members ${r.getLong(0)}")
      assert(r.getLong(2) === tl, s"top_label ${r.getLong(0)}")
      assert(r.getLong(3) === ppm, s"top_share_ppm ${r.getLong(0)}")
      assert(math.abs(r.getDouble(4) - mc) < 2e-6, s"mean_csim ${r.getLong(0)}")
    }
    // every vector is in exactly one cluster
    assert(rows.map(_.getLong(1)).sum === vecs.length.toLong)
    // fixture adequacy: purity must be contested somewhere (a cluster
    // with top_share < 100%) or the audit is vacuous
    assert(rows.exists(_.getLong(3) < 1000000L), "all clusters pure")
  }
}
