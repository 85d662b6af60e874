package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeriesSpec extends SparkSpec {

  test("q96 gap-fill: spine dense, observed rows untouched, holes repaired") {
    val rows = Series.gapFill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    // dense day spine: consecutive calendar days, no holes and no dups
    val days = rows.map(_._1)
    assert(days.distinct.length === days.length)
    val asDates = days.map(java.time.LocalDate.parse)
    asDates.sliding(2).foreach { case Array(a, b) =>
      assert(a.plusDays(1) === b, s"spine hole between $a and $b")
    }
    // edges are observed by construction (spine is min..max observed)
    assert(rows.head._2 === 1L && rows.last._2 === 1L)
    assert(rows.exists(_._2 === 0L), "fixture lost its sparsity")
    // interpolated counts stay within the neighbor envelope; LOCF equals
    // the previous observed revenue
    var lastObsRev = -1L
    var prevObsN = -1L
    val obsByDay = rows.filter(_._2 === 1L)
    rows.foreach { case (_, isObs, n, rev) =>
      if (isObs == 1L) { lastObsRev = rev; prevObsN = n }
      else {
        assert(rev === lastObsRev, "LOCF broke")
        assert(n >= 0L)
      }
    }
    // literal recompute of one hole: first gap's lerp value
    val obs = obsByDay.map(r => (java.time.LocalDate.parse(r._1).toEpochDay, r._3)).toMap
    rows.filter(_._2 === 0L).take(5).foreach { case (dy, _, n, _) =>
      val d = java.time.LocalDate.parse(dy).toEpochDay
      val pd = obs.keys.filter(_ < d).max
      val nd = obs.keys.filter(_ > d).min
      val expect = (obs(pd) * (nd - d) + obs(nd) * (d - pd)) / (nd - pd)
      assert(n === expect, s"$dy: lerp mismatch")
    }
  }

  test("q97 interval merge: islands disjoint, ordered, counts cross-foot") {
    val merged = Series.intervalMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(merged.nonEmpty)
    // per user: islands strictly separated (next start > prev end) and
    // each interval well-formed
    merged.groupBy(_._1).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._2)
      sorted.foreach { case (_, _, st, en, n) =>
        assert(st < en && n >= 1L, s"user $u: malformed island")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 > a._4, s"user $u: islands ${a._2}/${b._2} overlap")
        case _ => ()
      }
    }
    // every event lands in exactly one island
    val totalEvents = graft.Tables.load(spark, sf, "events").count()
    assert(merged.map(_._5).sum === totalEvents)
  }

  test("q97 merge semantics on a hand fixture via the same frame") {
    // one user, three intervals: [0,100], [50,120] overlap; [121,200]
    // touches nothing (121 > 120 strictly) -> 2 islands
    // second user: adjacent [0,10],[10,20] MERGE (start == prev end)
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 100L, 1L), (1L, 50L, 120L, 2L), (1L, 121L, 200L, 3L),
      (2L, 0L, 10L, 4L), (2L, 10L, 20L, 5L))
      .toDF("user_id", "st", "en", "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("st"), col("en"), col("event_id"))
    val prevMax = max(col("en")).over(
      w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val out = iv
      .withColumn("ni", when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min("st").as("s"), max("en").as("e"), count(lit(1)).as("n"))
      .orderBy(col("user_id"), col("island"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 1L, 0L, 120L, 2L), (1L, 2L, 121L, 200L, 1L),
      (2L, 1L, 0L, 20L, 2L)))
  }

  test("q102 deltas: gap-correct lags recompute literally") {
    val rows = Series.monthlyDeltas(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    val byMonth = rows.map(r => r._1 -> r._2).toMap
    def shift(m: String, k: Int): String = {
      val ym = java.time.YearMonth.parse(m).minusMonths(k)
      f"${ym.getYear}%04d-${ym.getMonthValue}%02d"
    }
    rows.foreach { case (m, rev, _, mom, yoy) =>
      assert(mom === byMonth.get(shift(m, 1)).map(rev - _), s"$m mom")
      assert(yoy === byMonth.get(shift(m, 12)).map(rev - _), s"$m yoy")
    }
    // first month has no predecessor in either frame
    val first = rows.minBy(_._1)
    assert(first._4.isEmpty && first._5.isEmpty)
  }

  test("q124 change points: statistic recomputes from the daily series") {
    val daily = graft.Tables.load(spark, sf, "orders")
      .groupBy(org.apache.spark.sql.functions.date_format(
        col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100)
          .cast("long")).as("rev"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val n = daily.length.toLong
    val sTotal = daily.map(_._2).sum
    var acc = 0L
    val stats = daily.zipWithIndex.dropRight(1).map { case ((day, rev), i) =>
      acc += rev
      (day, i + 1L, acc, math.abs(n * acc - (i + 1L) * sTotal))
    }
    val expTop = stats.sortBy(t => (-t._4, t._1)).take(5)
    val got = graft.operators.Series.changePoints(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq === expTop.toSeq)
    got.foreach { g =>
      assert(g._5 === g._3 / g._2, s"${g._1} mean_before")
      assert(g._6 === (sTotal - g._3) / (n - g._2), s"${g._1} mean_after")
    }
  }
}
