package graft.operators

import graft.SparkSpec

/** q183 held-out bigram cross-entropy: full driver-side recompute of the
  * add-one bigram model on the q47 hash split (train < 80, test ≥ 90,
  * val dropped) and the per-source report. */
class HeldoutXentSpec extends SparkSpec {

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  test("q183: per-source xent matches driver-side add-one bigram model") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val withBk = docs.map { case (id, src, tx) => (id, src, tx, h60(tx) % 100) }
    val train = withBk.filter(_._4 < 80)
    val test = withBk.filter(_._4 >= 90)
    assert(train.nonEmpty && test.nonEmpty, "fixture needs both splits")
    def bigrams(tx: String): Array[(String, String)] = {
      val t = tokensOf(tx)
      (0 until t.length - 1).map(i => (t(i), t(i + 1))).toArray
    }
    val cAb = train.flatMap(d => bigrams(d._3))
      .groupBy(identity).map { case (k, xs) => (k, xs.length.toLong) }
    val cA = cAb.groupBy(_._1._1).map { case (a, m) => (a, m.values.sum) }
    val v = train.flatMap(d => tokensOf(d._3)).distinct.length.toLong
    val perSource = test
      .map(d => (d._1, d._2, bigrams(d._3)))
      .filter(_._3.nonEmpty)
      .groupBy(_._2).map { case (src, ds) =>
        val terms = ds.flatMap { case (_, _, bs) => bs.map { b =>
          val ab = cAb.getOrElse(b, 0L)
          val a = cA.getOrElse(b._1, 0L)
          (ab, BigDecimal(math.log((a + v).toDouble / (ab + 1).toDouble))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP))
        } }
        val n = terms.length.toLong
        src -> (ds.length.toLong, n,
          terms.count(_._1 == 0L).toLong * 1000000L / n,
          BigDecimal(terms.map(_._2).sum.toDouble / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val rows = TextQueries.heldoutBigramXent(spark, sf).collect()
    assert(rows.length === perSource.size)
    rows.foreach { r =>
      val (nd, nt, ppm, mx) = perSource(r.getString(0))
      assert(r.getLong(1) === nd, s"n_docs ${r.getString(0)}")
      assert(r.getLong(2) === nt, s"n_trans ${r.getString(0)}")
      assert(r.getLong(3) === ppm, s"novel_ppm ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - mx) < 2e-6,
        s"mean_xent ${r.getString(0)}")
    }
    // the corpus fixture exercises the seen path; the planted test below
    // covers novel transitions (sf0.001's vocab is closed under train)
    assert(rows.exists(_.getLong(3) < 1000000L), "every transition novel")
  }

  test("q183: planted novel transition pays ln(c_a + V) exactly") {
    import spark.implicits._
    // find texts landing in each split bucket so the fixture is stable
    def bk(s: String): Long = h60(s) % 100
    val trainTxts = Iterator.from(0).map(i => s"alpha beta gamma t$i")
      .filter(t => bk(t) < 80).take(2).toSeq
    val testTxt = Iterator.from(0).map(i => s"alpha delta x$i")
      .filter(t => bk(t) >= 90).next()
    val docs = (trainTxts.zipWithIndex.map { case (t, i) =>
      (i.toLong, "s", t) } :+ ((99L, "s", testTxt)))
      .toDF("doc_id", "source", "text")
    val rows = TextQueries.heldoutBigramXentOf(docs).collect()
    assert(rows.length === 1)
    val r = rows.head
    // train: 2 docs x 3 transitions; vocab = {alpha,beta,gamma,t0,t1}=5
    // test doc "alpha delta xN": (alpha,delta) novel with c_a=2 (alpha
    // continues twice in train), (delta,xN) novel with c_a=0
    assert(r.getLong(2) === 2L, "n_trans")
    assert(r.getLong(3) === 1000000L, "both transitions novel")
    val expected = BigDecimal(
      (BigDecimal(math.log(7.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        + BigDecimal(math.log(5.0))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).toDouble / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(4) - expected) < 1e-9, "mean_xent")
  }
}
