package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

/** q182 DSIR: importance-resampling selection checked against a full
  * driver-side recomputation of the hashed-bigram log-likelihood-ratio
  * weights and the top-1/5 cut. */
class DsirSpec extends SparkSpec {

  private val buckets = 4096

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  test("q182 dsir: weights, ranking, and composition match driver recompute") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def bucketsOf(text: String): Array[Long] = {
      val t = tokensOf(text)
      (0 until t.length - 1).map(i => h60(t(i) + " " + t(i + 1)) % buckets)
        .toArray
    }
    val tgt = docs.filter(_._3 == "src0")
    val pool = docs.filter(_._3 != "src0")
    assert(tgt.nonEmpty && pool.nonEmpty, "fixture needs both sides")
    val ct = tgt.flatMap(d => bucketsOf(d._4))
      .groupBy(identity).map { case (b, xs) => (b, xs.length.toLong) }
    val cr = pool.flatMap(d => bucketsOf(d._4))
      .groupBy(identity).map { case (b, xs) => (b, xs.length.toLong) }
    val nt = ct.values.sum; val nr = cr.values.sum
    def lam(b: Long): BigDecimal = BigDecimal(math.log(
      (ct.getOrElse(b, 0L) + 1).toDouble * (nr + buckets).toDouble /
        ((cr.getOrElse(b, 0L) + 1).toDouble * (nt + buckets).toDouble)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val w = pool.map(d => (d._1, bucketsOf(d._4).map(lam).sum)).toMap
    val budget = pool.length / 5
    val selected = pool.map(d => (d._1, w(d._1)))
      .sortBy { case (id, wt) => (-wt, id) }
      .take(budget).map(_._1).toSet
    val expected = pool.groupBy(d => (d._2, d._3)).map { case (k, ds) =>
      val sel = ds.count(d => selected(d._1)).toLong
      val sw = ds.map(d => w(d._1)).sum
      val sws = ds.filter(d => selected(d._1)).map(d => w(d._1)).sum
      k -> (ds.length.toLong, sel, sel * 1000000L / ds.length,
        BigDecimal(sw.toDouble / ds.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        if (sel == 0) 0.0
        else BigDecimal(sws.toDouble / sel)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val rows = Curation.dsirSelect(spark, sf).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (np, ns, ppm, mw, mws) = expected(k)
      assert(r.getLong(2) === np, s"n_pool $k")
      assert(r.getLong(3) === ns, s"n_sel $k")
      assert(r.getLong(4) === ppm, s"sel_ppm $k")
      assert(math.abs(r.getDouble(5) - mw) < 2e-6, s"mean_w $k")
      assert(math.abs(r.getDouble(6) - mws) < 2e-6, s"mean_w_sel $k")
    }
    // the fixture must exercise a non-trivial cut: some group partially
    // selected (0 < sel < pool) so ranking order actually matters
    assert(expected.values.exists(v => v._2 > 0 && v._2 < v._1),
      "degenerate fixture: no group is partially selected")
    // target rows never appear in the report
    assert(rows.forall(_.getString(1) != "src0"))
  }

  test("q182 dsir: h60 bigram bucket matches PortableHash column") {
    val df = spark.createDataFrame(Seq(Tuple1("spark fast row"))).toDF("text")
    val got = df.select(explode(org.apache.spark.sql.functions.zip_with(
      slice(graft.functions.Text.tokens(col("text")), lit(1), lit(2)),
      slice(graft.functions.Text.tokens(col("text")), lit(2), lit(2)),
      (a, b) => PortableHash.h60(concat(a, lit(" "), b)) % buckets)))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(h60("spark fast") % buckets, h60("fast row") % buckets))
  }
}
