package graft.operators

import graft.SparkSpec

/** q184 NB confusion matrix: full driver-side recompute of the add-one
  * multinomial model, priors, argmax, and row shares. */
class NbConfusionSpec extends SparkSpec {

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  private def r9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("q184: confusion matrix matches driver-side NB recompute") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .map { case (id, src, tx) => (id, src, tokensOf(tx), h60(tx) % 100) }
    val train = docs.filter(_._4 < 80)
    val test = docs.filter(_._4 >= 90)
    assert(train.nonEmpty && test.nonEmpty)
    val tc = train.flatMap(d => d._3.map(t => (t, d._2)))
      .groupBy(identity).map { case (k, xs) => (k, xs.length.toLong) }
    val nc = train.flatMap(d => d._3.map(_ => d._2))
      .groupBy(identity).map { case (c, xs) => (c, xs.length.toLong) }
    val nDocsC = train.groupBy(_._2).map { case (c, ds) => (c, ds.length.toLong) }
    val nTrain = train.length.toLong
    val v = train.flatMap(_._3).distinct.length.toLong
    val classes = nDocsC.keys.toSeq.sorted
    val preds = test.map { case (id, actual, toks, _) =>
      val best = classes.map { c =>
        val prior = r9(math.log(nDocsC(c).toDouble / nTrain.toDouble))
        val ts = toks.map(t => r9(math.log(
          (tc.getOrElse((t, c), 0L) + 1).toDouble / (nc(c) + v).toDouble)))
          .foldLeft(BigDecimal(0))(_ + _)
        (c, prior + ts)
      }.minBy { case (c, sc) => (-sc, c) }._1
      (actual, best)
    }
    val cm = preds.groupBy(identity)
      .map { case (k, xs) => (k, xs.length.toLong) }
    val rowTot = preds.groupBy(_._1).map { case (a, xs) => (a, xs.length.toLong) }
    val rows = Curation.nbConfusion(spark, sf).collect()
    assert(rows.length === cm.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === cm(k), s"n_docs $k")
      assert(r.getLong(3) === cm(k) * 1000000L / rowTot(k._1), s"ppm $k")
    }
    // fixture adequacy: at least one off-diagonal and one diagonal cell,
    // or the argmax is never really contested
    assert(rows.exists(r => r.getString(0) == r.getString(1)))
    assert(rows.exists(r => r.getString(0) != r.getString(1)))
  }

  test("q184: unseen token and empty test doc both classify by the model") {
    import spark.implicits._
    def bk(s: String): Long = h60(s) % 100
    // two train classes with disjoint vocab; one test doc per class
    // containing one seen + one UNSEEN token, and the prior tiebreak
    // exercised by an all-unseen test doc
    val trA = Iterator.from(0).map(i => s"apple apple pear a$i")
      .filter(bk(_) < 80).take(2).toSeq
    val trB = Iterator.from(0).map(i => s"stone iron b$i")
      .filter(bk(_) < 80).take(3).toSeq
    val teA = Iterator.from(0).map(i => s"apple zz$i")
      .filter(bk(_) >= 90).next()
    val teU = Iterator.from(0).map(i => s"qq$i ww$i")
      .filter(bk(_) >= 90).next()
    val docs = (trA.map(("a", _)) ++ trB.map(("b", _)) :+
      (("a", teA)) :+ (("b", teU)))
      .zipWithIndex.map { case ((src, tx), i) => (i.toLong, src, tx) }
      .toDF("doc_id", "source", "text")
    val rows = Curation.nbConfusionOf(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // teA: "apple" strongly class a -> predicted a
    assert(rows(("a", "a")) === 1L)
    // teU: both tokens unseen; class scores reduce to prior +
    // 2*ln(1/(n_c+V)); b has more train docs (higher prior) but also
    // more token mass -- recompute which side wins
    val v = (trA ++ trB).flatMap(tokensOf).distinct.length
    val na = trA.flatMap(tokensOf).length; val nb = trB.flatMap(tokensOf).length
    val sa = r9(math.log(2.0 / 5)) + (r9(math.log(1.0 / (na + v))) * 2)
    val sb = r9(math.log(3.0 / 5)) + (r9(math.log(1.0 / (nb + v))) * 2)
    val want = if (sa > sb || (sa == sb)) "a" else "b"
    assert(rows(("b", want)) === 1L, s"unseen-doc predicted $want")
  }
}
