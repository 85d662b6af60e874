package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {

  test("q72 as-of enrichment equals the interval-containment join") {
    // the VERDICT-required equivalence: the union-sort as-of picks exactly
    // the version whose [valid_from, valid_to) interval contains the
    // purchase time (valid_to NULL = open current interval)
    import spark.implicits._
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"),
        col("event_type"), col("value"))
    val hist = Scd.scd2HistoryFrom(
      ev.filter(col("event_type").isin("signup", "error"))
        .select(col("user_id"), col("us"), col("event_id"),
          col("event_type").as("status")))
    val asof = Scd.pointInTimeEnrichFrom(ev, hist)

    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"), col("value"))
    val containment = purchases.alias("p")
      .join(hist.alias("h"),
        col("p.user_id") === col("h.user_id") &&
          col("h.valid_from") <= col("p.us") &&
          (col("h.valid_to").isNull || col("p.us") < col("h.valid_to")),
        "left")
      .select(col("p.event_id"), col("p.user_id"),
        col("p.us").as("ts_us"), col("p.value"),
        col("h.valid_from").as("state_from"), col("h.status").as("state"),
        col("h.n_events").as("state_events"))
    assert(asof.count() === purchases.count()) // containment can't fan out
    assert(asof.exceptAll(containment).count() === 0L)
    assert(containment.exceptAll(asof).count() === 0L)
    // and the enrichment is non-trivial on this data: some purchases carry
    // a state, some predate the user's first state version
    val states = asof.agg(
      count(when(col("state").isNotNull, 1)),
      count(when(col("state").isNull, 1))).head()
    assert(states.getLong(0) > 0)
  }

  test("same-µs version ties resolve to the later run deterministically") {
    import spark.implicits._
    // user 1: status A at us=100 (event 1), then B at us=100 (event 2) —
    // two runs share valid_from after µs truncation. The purchase at 150
    // must see B (the later run), on every run of the query.
    val changes = Seq((1L, 100L, 1L, "A"), (1L, 100L, 2L, "B"),
        (1L, 300L, 3L, "A"))
      .toDF("user_id", "us", "event_id", "status")
    val hist = Scd.scd2HistoryFrom(changes)
    // history has both runs; lead() over (valid_from, run_id) closes A at
    // B's open time: A's interval is empty, B's runs [100, 300)
    val rows = hist.orderBy(col("run_id")).collect()
      .map(r => (r.getString(1), r.getLong(2), Option(r.get(3))))
    assert(rows.toSeq === Seq(
      ("A", 100L, Some(100L)), ("B", 100L, Some(300L)), ("A", 300L, None)))
    val ev = Seq((10L, 1L, 150L, "purchase", 1.0), (11L, 1L, 50L, "purchase", 2.0))
      .toDF("event_id", "user_id", "us", "event_type", "value")
    val out = Scd.pointInTimeEnrichFrom(ev, hist).collect()
      .map(r => (r.getLong(0), Option(r.get(5)).map(_.toString)))
    assert(out.toSeq === Seq((10L, Some("B")), (11L, None)))
  }

  test("q71 history partitions each user's timeline without gaps") {
    val hist = Scd.scd2History(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
    hist.groupBy(_._1).foreach { case (_, runs) =>
      val sorted = runs.sortBy(_._2)
      // each version's valid_to is the next version's valid_from; exactly
      // one open (current) version per user, and it is the last one
      sorted.sliding(2).foreach {
        case Array((_, _, to), (_, from2, _)) => assert(to === Some(from2))
        case _ => ()
      }
      assert(sorted.init.forall(_._3.isDefined) && sorted.last._3.isEmpty)
    }
  }

  test("q80 CDC history: intervals never overlap; deletion gaps are real") {
    val hist = Scd.scd2CdcHistory(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    assert(hist.nonEmpty)
    var gaps = 0
    hist.groupBy(_._1).foreach { case (_, runs) =>
      val sorted = runs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, to, _), (_, from2, _, _)) =>
          // closed at or before the successor opens; a strict gap is a
          // deletion interval (the key did not exist in it)
          assert(to.isDefined && to.get <= from2)
          if (to.get < from2) gaps += 1
        case _ => ()
      }
      // at most one current version, and only in last position
      assert(sorted.init.forall(_._3.isDefined))
      // tombstone-closed final version: user may have NO current row
      assert(sorted.count(_._4) <= 1)
    }
    assert(gaps > 0, "no deletion gap found — tombstones had no effect")
    // tombstones strictly shrink coverage vs the delete-blind q71 history:
    // some users' q71-current version is closed here
    val open = hist.count(_._4)
    assert(open < hist.groupBy(_._1).size)
  }

  test("q82 dwell totals cross-foot with the CDC history") {
    val hist = Scd.scd2CdcHistory(spark, sf)
    val dwell = Scd.statusDwell(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(dwell.nonEmpty)
    dwell.foreach { case (st, n, total, open) =>
      assert(total > 0 && open <= n, s"$st: bad dwell row")
    }
    // version counts partition the history; open counts match is_current
    assert(dwell.map(_._2).sum === hist.count())
    assert(dwell.map(_._4).sum ===
      hist.filter(col("is_current")).count())
  }

  test("q81 as-of + tombstone mask equals the interval-containment join") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"),
        col("event_type"), col("value"))
    val hist = Scd.scd2HistoryCdcFrom(
      ev.filter(col("event_type").isin("view", "click", "signup", "error"))
        .select(col("user_id"), col("us"), col("event_id"),
          when(col("event_type") =!= "error", col("event_type")).as("status"),
          when(col("event_type") === "error", "d").otherwise("u").as("op")))
    val asof = Scd.pointInTimeEnrichCdcFrom(ev, hist)

    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"), col("value"))
    val containment = purchases.alias("p")
      .join(hist.alias("h"),
        col("p.user_id") === col("h.user_id") &&
          col("h.valid_from") <= col("p.us") &&
          (col("h.valid_to").isNull || col("p.us") < col("h.valid_to")),
        "left")
      .select(col("p.event_id"), col("p.user_id"),
        col("p.us").as("ts_us"), col("p.value"),
        col("h.valid_from").as("state_from"), col("h.status").as("state"),
        col("h.n_events").as("state_events"))
    assert(asof.count() === purchases.count()) // non-overlap: no fan-out
    assert(asof.exceptAll(containment).count() === 0L)
    assert(containment.exceptAll(asof).count() === 0L)
    // deletion gaps genuinely mask: some purchases carry NULL state even
    // though the user HAD a version before the purchase (the delete-blind
    // q72-style join would resurrect it)
    val firsts = hist.groupBy(col("user_id"))
      .agg(min(col("valid_from")).as("first_from"))
    val masked = asof.filter(col("state").isNull)
      .join(firsts, Seq("user_id"))
      .filter(col("first_from") <= col("ts_us"))
    assert(masked.count() > 0)
  }
}
