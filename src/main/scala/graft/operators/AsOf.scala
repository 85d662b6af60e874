package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (temporal) join — for each left row, the single right row with the
  * greatest `rTime <= lTime` per key: the batch-correct form of the
  * reference's "current dim value" point lookups
  * (gmall-realtime DimUtil.java getDimInfo — latest HBase row at process
  * time), made reproducible by evaluating AT the event's own time.
  *
  * Spark lacks a native as-of join; the classic scale-safe plan is the
  * UNION-SORT construction: tag right rows, union them with left rows on
  * the shared key/time axis, ONE hash shuffle by key + ONE sort by
  * (time, side), and a running `last(payload, ignoreNulls)` window carries
  * each right row forward to every later left row. No range self-join
  * (which explodes quadratically per key), no per-key loop, no broadcast
  * requirement on either side. A right row at exactly lTime sorts before
  * the left row (side desc), so "at or before" includes simultaneous
  * versions — the same tie rule as DuckDB's ASOF JOIN on `l.t >= r.t`.
  *
  * Contract: `right` must be unique per (key, rTime) — callers reduce
  * multi-writer ties first (q61 takes MAX(value) per (user, ts)) so the
  * winning row is a pure function of the data, not of sort stability.
  * Payload columns must be NON-NULL on right rows: the per-column
  * ignoreNulls fill would otherwise carry the previous version's value
  * through a null — encode "absent" as a sentinel instead (q81 rides
  * valid_to through as Long.MaxValue for open versions).
  */
object AsOf {

  /** Left as-of join. `rPayload` columns are appended with `suffix`; the
    * matched right timestamp is appended as `asof_ts`. Key and time
    * column names must match on both sides (rename before calling). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               timeCol: String, rPayload: Seq[String],
               suffix: String = "_asof"): DataFrame = {
    val lCols = left.columns.toSeq
    val rSchema = right.schema
    val lSide = left
      .withColumn("__r", lit(0))
      .select(lCols.map(col) ++ Seq(col("__r")) ++
        rPayload.map(c => lit(null).cast(rSchema(c).dataType).as(s"$c$suffix")): _*)
    val rSide = right
      .withColumn("__r", lit(1))
      .select(lCols.map(c =>
          if (key.contains(c) || c == timeCol) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__r")) ++
        rPayload.map(c => col(c).as(s"$c$suffix")): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(timeCol).asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lSide.unionByName(rSide)
      .withColumn("asof_ts",
        last(when(col("__r") === 1, col(timeCol)), ignoreNulls = true).over(w))
    val payloadCarried = rPayload.foldLeft(carried) { (df, c) =>
      df.withColumn(s"$c$suffix",
        last(col(s"$c$suffix"), ignoreNulls = true).over(w))
    }
    payloadCarried.filter(col("__r") === 0)
      .select(lCols.map(col) ++ Seq(col("asof_ts")) ++
        rPayload.map(c => col(s"$c$suffix")): _*)
  }

  /** q61: every event enriched with the user's latest 'click' at or before
    * its own timestamp — click time and value, NULL when no click yet.
    * Declared at MICROsecond resolution: the events parquet carries
    * TIMESTAMP(NANOS), which DuckDB truncates to µs on scan, so both
    * engines as-of-join in the µs domain by construction (`ts div 1000`
    * here, native µs timestamps there) instead of silently comparing at
    * different precisions. The right side is reduced to MAX(value) per
    * (user, µs) first, so the as-of winner is data-determined. */
  def asOfClick(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val left = ev.select(col("event_id"), col("user_id"),
      expr("ts div 1000").as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("value")).as("click_value"))
    asOfJoin(left, clicks, Seq("user_id"), "ts_us", Seq("click_value"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_ts").as("click_ts_us"),
        col("click_value_asof").as("click_value"))
      .orderBy(col("event_id"))
  }
}
