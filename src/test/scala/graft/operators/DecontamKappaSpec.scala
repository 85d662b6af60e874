package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q194 decontamination-method agreement: cells reconcile exactly with
  * the two source operators' own flag sets, and κ matches a driver-side
  * recompute. */
class DecontamKappaSpec extends SparkSpec {

  test("q194: cells reconcile with q56/q170 flag sets, kappa exact") {
    val rows = Curation.decontamAgreement(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq.sorted === Seq("train", "val"))
    val gram = Curation.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val winn = Curation.winnowDecontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (split, n, n11, n10, n01, n00, kppm) =>
      assert(n === n11 + n10 + n01 + n00, s"$split cells must partition")
      val g = gram.count(_._2 == split).toLong
      val w = winn.count(_._2 == split).toLong
      assert(n11 + n10 === g, s"$split gram marginal")
      assert(n11 + n01 === w, s"$split winnow marginal")
      val both = gram.keySet.intersect(winn.keySet)
        .count(id => gram(id) == split).toLong
      assert(n11 === both, s"$split both-flagged cell")
      // driver-side kappa recompute (q166 integer convention)
      val pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
      val expected =
        if (n == 0) 0L
        else if (n * n == pe) { if (n11 + n00 == n) 1000000L else 0L }
        else (n * (n11 + n00) - pe) * 1000000L / (n * n - pe)
      assert(kppm === expected, s"$split kappa")
    }
  }
}
