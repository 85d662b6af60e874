package graft.operators

import graft.SparkSpec

/** q190 NB margin calibration: decile structure over the corpus plus a
  * planted two-class corpus where margin must order confidence. */
class NbCalibrationSpec extends SparkSpec {

  test("q190: exact deciles, non-negative monotone margins") {
    val rows = Curation.nbMarginCalib(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq === (1L to 10L))
    // rank-decile construction: bucket sizes differ by at most 1
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    rows.foreach { case (_, n, nc, acc, mm) =>
      assert(nc >= 0 && nc <= n)
      assert(acc === nc * 1000000 / n)
      assert(mm >= 0, "top-1 minus top-2 margin cannot be negative")
    }
    // deciles are rank buckets over the margin: means must be sorted
    val means = rows.map(_._5)
    assert(means.zip(means.tail).forall { case (a, b) => a <= b })
  }

  test("q190: planted separable classes put correct docs in high deciles") {
    import spark.implicits._
    val h = (s: String) => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map(b => f"$b%02x").mkString.substring(0, 15), 16) % 100
    }
    // class-a vocab {aa,bb}, class-b vocab {cc,dd}; train docs per class,
    // plus test docs: clearly classed (large margin, correct) and a mixed
    // ambiguous one (small margin)
    def mk(base: String, bucket: Long => Boolean): String =
      Iterator.from(0).map(i => s"$base x$i").filter(t => bucket(h(t))).next()
    val trainA = (1 to 3).map(i => mk(Seq.fill(6)("aa bb").mkString(" "), _ < 80))
    val trainB = (1 to 3).map(i => mk(Seq.fill(6)("cc dd").mkString(" "), _ < 80))
    val testA = mk(Seq.fill(6)("aa bb").mkString(" "), _ >= 90)
    val testMix = mk("aa bb cc dd", _ >= 90)
    val docs = (trainA.map(("a", _)) ++ trainB.map(("b", _)) ++
      Seq(("a", testA), ("a", testMix))).zipWithIndex
      .map { case ((src, tx), i) => (i.toLong, src, tx) }
      .toDF("doc_id", "source", "text")
    val rows = Curation.nbMarginCalibOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // 2 test docs -> deciles 1-5 hold the ambiguous doc, 6-10 the clear one
    assert(rows.map(_._2).sum === 2L)
    val hi = rows.filter(_._1 > 5).head
    val lo = rows.filter(_._1 <= 5).head
    assert(hi._3 === 1L, "clear doc must be correct")
    assert(hi._4 > lo._4, "clear doc must carry the larger margin")
  }
}
