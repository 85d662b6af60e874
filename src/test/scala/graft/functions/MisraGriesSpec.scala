package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {

  /** Zipf-ish adversarial fixture: vocabulary (2000 words) far above the
    * sketch capacity, a few genuinely heavy items, a long uniform tail. */
  private def skewed = {
    val s = spark
    import s.implicits._
    val heavy = Seq.fill(3000)("alpha") ++ Seq.fill(2200)("beta") ++
      Seq.fill(1500)("gamma")
    val tail = (1 to 8000).map(i => s"tail${i % 2000}")
    // interleave adversarially: heavy items FIRST, so the tail's arrival
    // forces decrements against the already-counted heavy keys
    (heavy ++ tail).toDF("w")
  }

  test("MG candidates are a superset of true heavy hitters, at any split") {
    val df = skewed
    val n = df.count()
    val k = 50
    val exactHeavy = df.groupBy("w").count()
      .filter(col("count") * k > n)
      .collect().map(_.getString(0)).toSet
    assert(exactHeavy === Set("alpha", "beta", "gamma")) // fixture sanity
    for (parts <- Seq(1, 7, 32)) {
      val mg = udaf(MisraGries(k))
      val cands = df.repartition(parts).agg(mg(col("w"))).head()
        .getSeq[String](0).toSet
      assert(exactHeavy.subsetOf(cands),
        s"parts=$parts lost ${exactHeavy -- cands}")
      assert(cands.size <= k - 1, s"parts=$parts summary overflows: ${cands.size}")
    }
  }

  test("MG state stays bounded while the exact table is vocabulary-sized") {
    val df = skewed
    val mg = udaf(MisraGries(20))
    val cands = df.agg(mg(col("w"))).head().getSeq[String](0)
    assert(cands.size <= 19)
    assert(df.select(countDistinct(col("w"))).head().getLong(0) > 1000L)
  }

  test("q116 output equals the naive exact GROUP BY (sketch-independent)") {
    val k = 64
    val q = graft.operators.Stats.heavyHitters(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val toks = graft.Tables.load(spark, sf, "documents")
      .select(explode(Text.tokens(col("text"))).as("w"))
    val n = toks.count()
    val naive = toks.groupBy("w").count()
      .filter(col("count") * k > n)
      .orderBy("w").collect()
      .map(r => (r.getString(0), r.getLong(1), n))
    assert(q.toSeq === naive.toSeq)
    assert(q.nonEmpty)
  }
}
