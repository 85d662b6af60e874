package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the wide-format aggregation family: q83 RANGE-frame
  * rolling windows, q84 pivot, q85 rollup. Each cross-foots against an
  * independent recomputation, not just its own arithmetic. */
class WideAggSpec extends SparkSpec {

  test("q121 session paths: fixture sessionizes on the gap and truncates") {
    import spark.implicits._
    val G = 600000000000L // 10 min in ns
    // user 1: 6 events in one session (path truncates to 5), then a gap
    // opens a second session; user 2: single-event session. Same-ts rows
    // order by event_id.
    val e = Seq(
      (1L, 0L * G, 1L, "a"), (1L, 0L * G, 2L, "b"), (1L, 1L, 3L, "c"),
      (1L, 2L, 4L, "d"), (1L, 3L, 5L, "e"), (1L, 4L, 6L, "f"),
      (1L, 2L * G, 7L, "z"),
      (2L, 0L, 8L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = RefQueries.sessionPathsFrom(e, G, 5, 20).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a>b>c>d>e" -> 1L, "z" -> 1L, "a" -> 1L))
  }

  test("q83 rolling week equals a literal trailing-7-day recomputation") {
    val rows = RefQueries.rollingDaily(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val byDay = rows.map(r => java.time.LocalDate.parse(r._1) -> r._2).toMap
    rows.foreach { case (day, _, actives, r7, r7days) =>
      val d = java.time.LocalDate.parse(day)
      val window = (0 to 6).flatMap(k => byDay.get(d.minusDays(k.toLong)))
      assert(r7 === window.sum, s"$day: RANGE frame != literal recompute")
      assert(r7days === window.size.toLong && r7days <= 7L)
      assert(actives > 0)
    }
    // the frame is day-VALUE based: if the calendar had gaps, r7_days < 7
    // proves RANGE (not ROWS) semantics; on gapless data all interior
    // days must see a full week
    assert(rows.drop(6).forall(_._5 === 7L))
  }

  test("q84 pivot cross-foots: cells sum to row totals and to the event count") {
    val rows = RefQueries.pivotDaily(spark, sf).collect()
    val types = Seq("click", "error", "purchase", "signup", "view")
    rows.foreach { r =>
      val cells = types.map(t => r.getAs[Long](t))
      assert(cells.sum === r.getAs[Long]("total"))
    }
    val total = rows.map(_.getAs[Long]("total")).sum
    assert(total === graft.Tables.load(spark, sf, "events").count())
  }

  test("q87 transition matrix: rows count every event once; shares sum to 1") {
    val events = graft.Tables.load(spark, sf, "events")
    val nEvents = events.count()
    val nUsers = events.select(col("user_id")).distinct().count()
    val rows = RefQueries.transitionMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // every event appears exactly once as a 'next'
    assert(rows.map(_._3).sum === nEvents)
    // each user's first event transitions from _start
    assert(rows.filter(_._1 === "_start").map(_._3).sum === nUsers)
    // outgoing shares sum to ~1 per prev state (rounding only)
    rows.groupBy(_._1).foreach { case (prev, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4, s"$prev shares")
    }
  }

  test("q88 gap histogram: buckets bound their members; totals cross-foot") {
    val events = graft.Tables.load(spark, sf, "events")
    val nEvents = events.count()
    val nUsers = events.select(col("user_id")).distinct().count()
    val rows = RefQueries.gapHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one gap per event except each user's first
    assert(rows.map(_._2).sum === nEvents - nUsers)
    rows.foreach { case (bucket, n, minMs, maxMs) =>
      assert(n > 0 && minMs <= maxMs)
      if (bucket === -1L) assert(minMs === 0L && maxMs === 0L)
      else {
        val lo = 1L << bucket
        assert(minMs >= lo && maxMs < lo * 2,
          s"bucket $bucket: [$minMs,$maxMs] outside [$lo,${lo * 2})")
      }
    }
  }

  test("q89 deciles: balanced extras-first sizes, monotone non-overlapping bounds") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val perLang = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = RefQueries.langDeciles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length))
      assert(sorted.map(_._3).sum === perLang(lang))
      // standard NTILE: sizes differ by at most 1, larger buckets first
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1 &&
        sizes.toSeq === sizes.sortBy(-_).toSeq)
      // value ranges are ordered (ties may share a boundary value)
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, hi), (_, _, _, lo, _)) => assert(hi <= lo)
        case _ => ()
      }
    }
  }

  test("q85 rollup: subtotals and grand total equal their detail sums") {
    val rows = RefQueries.rollupPricing(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getAs[Long]("gid"), r.getAs[Double]("sum_qty"),
        r.getAs[Long]("count_order")))
    val detail = rows.filter(_._3 === 0L)
    val byFlag = rows.filter(_._3 === 1L)
    val grand = rows.filter(_._3 === 3L)
    assert(grand.length === 1 && byFlag.nonEmpty && detail.nonEmpty)
    // exactly the three rollup grains, nothing else
    assert(rows.map(_._3).distinct.sorted.toSeq === Seq(0L, 1L, 3L))
    byFlag.foreach { case (flag, status, _, qty, n) =>
      assert(status.isEmpty)
      val d = detail.filter(_._1 === flag)
      assert(n === d.map(_._5).sum)
      assert(math.abs(qty - d.map(_._4).sum) < 1e-6)
    }
    assert(grand.head._5 === detail.map(_._5).sum)
    assert(math.abs(grand.head._4 - detail.map(_._4).sum) < 1e-6)
  }

  test("q95 cube: all 8 grains present and every grain cross-foots") {
    val rows = RefQueries.cubeOrders(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        Option(r.getAs[java.lang.Long]("o_year")).map(_.longValue),
        r.getAs[Long]("gid"), r.getAs[Long]("order_ct"),
        r.getAs[Double]("revenue")))
    assert(rows.map(_._4).distinct.sorted.toSeq === (0L to 7L).toSeq)
    val detail = rows.filter(_._4 === 0L)
    // every non-detail grain's counts and revenue re-sum from the detail
    rows.filterNot(_._4 === 0L).foreach {
      case (st, pr, yr, gid, n, rev) =>
        val d = detail.filter { case (s2, p2, y2, _, _, _) =>
          ((gid & 4) != 0 || s2 === st) &&
          ((gid & 2) != 0 || p2 === pr) &&
          ((gid & 1) != 0 || y2 === yr)
        }
        assert(n === d.map(_._5).sum, s"count at gid=$gid ($st,$pr,$yr)")
        assert(math.abs(rev - d.map(_._6).sum) < 1e-6,
          s"revenue at gid=$gid ($st,$pr,$yr)")
    }
    // the grand total is a single row counting every order
    val grand = rows.filter(_._4 === 7L)
    assert(grand.length === 1 &&
      grand.head._5 === graft.Tables.load(spark, sf, "orders").count())
  }
}
