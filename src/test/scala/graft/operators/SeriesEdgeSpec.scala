package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior for the series/graph/stats families: a
  * maintenance job pointed at an empty partition (fresh store, filtered-
  * out day) must return empty frames, not throw — the property that lets
  * these queries run unguarded in a scheduled pipeline. */
class SeriesEdgeSpec extends SparkSpec {

  test("gap-fill over an empty observation set yields an empty spine") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("d", "n", "rev_cents")
    assert(Series.gapFillFrom(empty).collect().isEmpty)
  }

  test("gap-fill over a single observed day is that day, no holes") {
    val s = spark; import s.implicits._
    val one = Seq((20000L, 3L, 999L)).toDF("d", "n", "rev_cents")
    val out = Series.gapFillFrom(one).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("2024-10-04", 1L, 3L, 999L)))
  }

  test("interval merge state ops tolerate empty batches and empty state") {
    val s = spark; import s.implicits._
    val emptyBatch = Seq.empty[(Long, Long, Long, Long)]
      .toDF("user_id", "st", "en", "event_id")
    val st0 = graft.streaming.SeriesStream.emptyState(s)
    // empty + empty
    assert(graft.streaming.SeriesStream.mergeBatch(st0, emptyBatch)
      .collect().isEmpty)
    // state + empty batch: carried through unchanged
    val st1 = graft.streaming.SeriesStream.mergeBatch(st0,
      Seq((1L, 0L, 10L, 1L)).toDF("user_id", "st", "en", "event_id"))
    val st2 = graft.streaming.SeriesStream.mergeBatch(st1, emptyBatch)
    assert(st2.collect().map(_.toSeq).toSet ===
      st1.collect().map(_.toSeq).toSet)
  }

  test("day-state merge tolerates empty sides") {
    val s = spark; import s.implicits._
    val st0 = graft.streaming.SeriesStream.emptyDayState(s)
    val batch = Seq((20000L, 2L, 500L)).toDF("d", "n", "rev_cents")
    assert(graft.streaming.SeriesStream.mergeDayBatch(st0, st0)
      .collect().isEmpty)
    val st1 = graft.streaming.SeriesStream.mergeDayBatch(st0, batch)
    assert(st1.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((20000L, 2L, 500L)))
  }
}
