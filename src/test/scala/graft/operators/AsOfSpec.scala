package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("as-of join picks the greatest right time <= left time per key") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 50L), (4L, 30L, 99L))
      .toDF("event_id", "k", "t")
    val right = Seq((10L, 100L, 1.0), (10L, 200L, 2.0), (20L, 49L, 3.0), (30L, 100L, 4.0))
      .toDF("k", "t", "v")
    val out = AsOf.asOfJoin(left, right, Seq("k"), "t", Seq("v"))
      .orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      (1L, Some(100L), Some(1.0)), // simultaneous right row matches (<=)
      (2L, Some(200L), Some(2.0)), // latest of two prior versions
      (3L, Some(49L), Some(3.0)),
      (4L, None, None)))           // no version yet -> left-join nulls
  }

  test("q61 equals a driver-side replay of the as-of rule") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val clicksByUser = ev.filter(_._4 == "click")
      .groupBy(_._2).map { case (u, rows) =>
        // MAX(value) per (user, µs) — the declared tie reduction
        u -> rows.groupBy(_._3).map { case (t, g) => (t, g.map(_._5).max) }
          .toArray.sortBy(_._1)
      }
    val expected = ev.map { case (id, u, t, _, _) =>
      val hit = clicksByUser.get(u)
        .flatMap(cs => cs.view.filter(_._1 <= t).lastOption)
      (id, hit.map(_._1), hit.map(_._2))
    }.sortBy(_._1)
    val got = AsOf.asOfClick(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq === expected.toSeq)
  }

  test("q61 plan: one hash shuffle + running window, no range join or cartesian") {
    val df = AsOf.asOfClick(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
    // the union-sort construction shuffles by key once (plus the final
    // presentation sort); no per-key range self-join appears
    val shuffles = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(shuffles >= 1, plan)
  }
}
