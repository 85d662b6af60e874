package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GrowthSpec extends SparkSpec {

  test("growth quad on a hand-computed activity fixture") {
    import spark.implicits._
    // u1: days 1,2,4  u2: days 2,3  u3: day 1 only  (window ends day 4)
    val act = Seq((1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-04"),
        (2L, "2024-01-02"), (2L, "2024-01-03"), (3L, "2024-01-01"))
      .toDF("user_id", "ds").select(col("user_id"), col("ds").cast("date").as("d"))
    val out = RefQueries.growthAccountingFrom(act).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      // dy, active, new, retained, resurrected, churned
      ("2024-01-01", 2L, 2L, 0L, 0L, 0L), // u1,u3 new
      ("2024-01-02", 2L, 1L, 1L, 0L, 1L), // u2 new, u1 retained; u3 churned
      ("2024-01-03", 1L, 0L, 1L, 0L, 1L), // u2 retained; u1 churned (gap)
      ("2024-01-04", 1L, 0L, 0L, 1L, 1L))) // u1 resurrected; u2 churned
    // u1's final churn (after day 4) and u3's would-be resurrection are
    // outside the window: no 01-05 row
  }

  test("q78 invariants: funnel reach nests inside cohort population") {
    val rows = RefQueries.cohortConversion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (dy, users, funnel, conv, rate) =>
      assert(conv <= funnel && funnel <= users, s"$dy: nesting broken")
      assert(math.abs(rate - math.round(conv.toDouble / users * 1e6) / 1e6) < 1e-12)
    }
    // cohort populations sum to the user universe (each user in exactly one)
    val totalUsers = graft.Tables.load(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("user_id")).distinct().count()
    assert(rows.map(_._2).sum === totalUsers)
  }

  test("q79 invariants: quantiles ordered; converted nests in step-2 reach") {
    val rows = RefQueries.funnelDurations(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).sorted === Seq("click_to_purchase", "view_to_click",
      "view_to_purchase"))
    rows.foreach { case (step, n, p50, p90, p99) =>
      assert(n > 0 && p50 > 0, s"$step: empty or non-positive duration")
      assert(p50 <= p90 && p90 <= p99, s"$step: quantiles out of order")
    }
    val byStep = rows.map(r => r._1 -> r._2).toMap
    // converted ⊆ s2-in-window (t3-t1 ≤ W forces t2-t1 ≤ W since t2 < t3)
    assert(byStep("view_to_purchase") === byStep("click_to_purchase"))
    assert(byStep("view_to_click") >= byStep("view_to_purchase"))
  }

  test("q92 invariants: cohort durations cross-foot with q79's global rows") {
    val global = RefQueries.funnelDurations(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = RefQueries.cohortDurations(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (cd, step, n, p50, p90, p99) =>
      assert(n > 0 && p50 > 0 && p50 <= p90 && p90 <= p99, s"$cd/$step")
    }
    // per-step observation counts partition q79's global counts exactly
    rows.groupBy(_._2).foreach { case (step, rs) =>
      assert(rs.map(_._3).sum === global(step), s"$step n_obs partition")
    }
  }

  test("q73 invariants: quad sums to actives; churn balances yesterday") {
    val rows = RefQueries.growthAccounting(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // every active user is classified exactly once
    rows.foreach { case (dy, active, nw, ret, res, _) =>
      assert(active === nw + ret + res, s"quad invariant broken on $dy")
    }
    // churned(d) = actives(d-1) - retained(d) on consecutive-day pairs
    rows.sliding(2).foreach {
      case Array((d0, a0, _, _, _, _), (d1, _, _, ret1, _, ch1))
        if java.time.LocalDate.parse(d1) ==
          java.time.LocalDate.parse(d0).plusDays(1) =>
        assert(ch1 === a0 - ret1, s"churn balance broken on $d1")
      case _ => ()
    }
  }
}
