package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  test("q77 detector finds injected orphans and counts repeats vs keys") {
    import spark.implicits._
    // parents 1..3; facts: two valid, one bad key repeated 3x, one other
    // bad key once, one NULL (not an orphan by definition)
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val fact = Seq(Some(1L), Some(3L), Some(99L), Some(99L), Some(99L),
        Some(7L), None)
      .toDF("fk")
    val out = RefQueries.fkAudit("t.fk->p", fact, "fk", parent, "pk").head()
    assert(out.getString(0) === "t.fk->p")
    assert(out.getLong(1) === 4L) // 99,99,99,7
    assert(out.getLong(2) === 2L) // {99, 7}
    // and a clean relation reports zeros (one row, not zero rows)
    val clean = RefQueries.fkAudit("clean", Seq(1L, 2L).toDF("fk"), "fk",
      parent, "pk").head()
    assert(clean.getLong(1) === 0L && clean.getLong(2) === 0L)
  }

  test("q76 profile invariants on the real table") {
    val rows = RefQueries.profileLineitem(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length === 5)
    val n = rows.head._2
    rows.foreach { case (c, nr, nn, nd, mn, mx) =>
      assert(nr === n, s"$c: inconsistent row count")
      assert(nn >= 0 && nd >= 1 && nd <= nr - nn, s"$c: count bounds")
      assert(mn <= mx, s"$c: min>max")
    }
    // the profile distinguishes low-cardinality from high-cardinality cols
    val byName = rows.map(r => r._1 -> r._4).toMap
    assert(byName("l_discount") < 20 && byName("l_extendedprice") > 1000)
  }
}
