package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q167-q169: the distribution-audit family's invariants, each checked
  * against an independent driver-side recomputation. */
class DistAuditSpec extends SparkSpec {

  private def toksOf(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  test("q167 Zipf buckets cross-foot the vocabulary and the corpus mass") {
    val rows = TextQueries.zipfBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("text")).collect().map(r => toksOf(r.getString(0)))
    val freq = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
    assert(rows.map(_._3).sum === freq.size.toLong, "vocab cross-foot")
    assert(rows.map(_._4).sum === docs.map(_.length.toLong).sum,
      "corpus mass cross-foot")
    rows.foreach { case (b, lo, n, _, ppm) =>
      assert(lo === (1L << b))
      assert(n <= (1L << b), s"bucket $b holds more ranks than it spans")
      assert(ppm <= 1000000L)
    }
    // independent recompute of per-bucket mass from the driver-side freqs
    val ranked = freq.toSeq.sortBy { case (t, f) => (-f, t) }.zipWithIndex
    val expect = ranked.groupBy { case (_, i) =>
      63 - java.lang.Long.numberOfLeadingZeros(i + 1L)
    }.view.mapValues(_.map(_._1._2.toLong).sum).toMap
    rows.foreach { case (b, _, _, mass, _) =>
      assert(mass === expect(b.toInt), s"bucket $b mass") }
  }

  test("q168 surprisal recomputes exactly and separates rare from common") {
    val rows = TextQueries.unigramSurprisal(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))))
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> toksOf(r.getString(1))).toMap
    val freq = docs.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = freq.values.sum
    rows.foreach { case (id, nt, avg) =>
      val toks = docs(id)
      assert(nt === toks.length.toLong)
      if (toks.nonEmpty) {
        val s = toks.map(t => BigDecimal(math.log(n.toDouble / freq(t)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
        val expect = BigDecimal(s.toDouble / toks.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(avg - expect) < 1e-9, s"doc $id surprisal")
      } else assert(avg == null)
    }
    // the corpus-level sanity: average surprisal must sit between the
    // most and least surprising single tokens
    val lnMax = math.log(n.toDouble / freq.values.min)
    val lnMin = math.log(n.toDouble / freq.values.max)
    rows.filter(_._2 > 0).foreach { case (_, _, avg) =>
      assert(avg >= lnMin - 1e-6 && avg <= lnMax + 1e-6) }
  }

  test("q169 centroid drift: bounded and recomputed exactly per label") {
    val rows = Similarity.labelCentroidDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nv, c) =>
      assert(nv > 0)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // labels partition the corpus: member counts cross-foot
    val embRows = graft.Tables.load(spark, sf, "embeddings")
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(rows.map(_._2).sum === embRows.length.toLong)
    // independent driver recomputation with the same decimal-exact means
    def mean(vs: Array[Array[Float]]): Array[Double] =
      (0 until 64).map { i =>
        val s = vs.map(v => BigDecimal(v(i).toDouble)
          .setScale(7, BigDecimal.RoundingMode.HALF_UP)).sum
        (s / vs.length).toDouble
      }.toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val ge = mean(embRows.map(_._2))
    rows.foreach { case (lbl, nv, drift) =>
      val members = embRows.filter(_._1 == lbl).map(_._2)
      assert(nv === members.length.toLong)
      val expect = cos(mean(members), ge)
      assert(math.abs(drift - expect) < 1e-5,
        s"label $lbl drift $drift vs recomputed $expect")
    }
  }
}
