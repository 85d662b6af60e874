package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SeriesStreamSpec extends SparkSpec {

  private def stateSet(df: DataFrame) = df.collect().map(r =>
    (r.getAs[Long]("user_id"), r.getAs[Long]("island"),
      r.getAs[Long]("start_us"), r.getAs[Long]("end_us"),
      r.getAs[Long]("n_events"))).toSet

  /** Raw intervals exactly as q97 derives them from the events table. */
  private def rawIntervals: DataFrame =
    graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("st"), col("event_id"))
      .withColumn("en",
        col("st") + (col("event_id") % 300 + 30) * lit(1000000L))

  test("streamed island state equals batch q97 over the real stream") {
    val iv = rawIntervals.withColumn("bucket", col("event_id") % 4)
    // 4 uneven, TIME-UNSORTED splits (bucketed by id, not ts)
    var st = SeriesStream.emptyState(spark)
    Seq(0L, 1L, 2L, 3L).foreach { b =>
      st = SeriesStream.mergeBatch(st,
        iv.filter(col("bucket") === b)).localCheckpoint(true)
    }
    val batch = graft.operators.Series.intervalMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(stateSet(SeriesStream.report(st)) === batch)
  }

  test("replay order is immaterial (closure property)") {
    val iv = rawIntervals.withColumn("bucket", col("event_id") % 3)
    def run(order: Seq[Long]) = {
      var st = SeriesStream.emptyState(spark)
      order.foreach { b =>
        st = SeriesStream.mergeBatch(st,
          iv.filter(col("bucket") === b)).localCheckpoint(true)
      }
      stateSet(st)
    }
    assert(run(Seq(0L, 1L, 2L)) === run(Seq(2L, 0L, 1L)))
  }

  test("a late interval bridges two islands and renumbers ordinals") {
    val s = spark; import s.implicits._
    // state: user 1 has islands [0,10] and [100,110]; the late interval
    // [5,105] overlaps BOTH -> one island [0,110], counts sum 2+1+1
    var st = SeriesStream.mergeBatch(SeriesStream.emptyState(s),
      Seq((1L, 0L, 10L, 1L), (1L, 100L, 110L, 2L))
        .toDF("user_id", "st", "en", "event_id"))
    assert(stateSet(st) === Set((1L, 1L, 0L, 10L, 1L), (1L, 2L, 100L, 110L, 1L)))
    st = SeriesStream.mergeBatch(st,
      Seq((1L, 5L, 105L, 3L)).toDF("user_id", "st", "en", "event_id"))
    assert(stateSet(st) === Set((1L, 1L, 0L, 110L, 3L)))
  }

  test("untouched users carry through; early insert renumbers") {
    val s = spark; import s.implicits._
    var st = SeriesStream.mergeBatch(SeriesStream.emptyState(s),
      Seq((1L, 100L, 110L, 1L), (2L, 0L, 5L, 2L))
        .toDF("user_id", "st", "en", "event_id"))
    // user 1 gets an interval BEFORE its island: ordinals shift, user 2
    // (untouched) keeps its row
    st = SeriesStream.mergeBatch(st,
      Seq((1L, 0L, 10L, 3L)).toDF("user_id", "st", "en", "event_id"))
    assert(stateSet(st) === Set(
      (1L, 1L, 0L, 10L, 1L), (1L, 2L, 100L, 110L, 1L), (2L, 1L, 0L, 5L, 1L)))
  }
}
