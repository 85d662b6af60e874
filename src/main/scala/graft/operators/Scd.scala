package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Slowly-changing-dimension type 2: validity-interval history built from
  * a change stream. The reference's dimension store is last-write-wins
  * (SCD1 — DimSink.java:43-91 upserts by pk, our K3 analogue
  * `DynamicRouting.upsertDims`); type 2 instead CLOSES the old version and
  * opens a new one on every attribute change, so point-in-time joins (the
  * q61 as-of) can reconstruct any historical state.
  *
  * Construction is two window passes over one user-keyed sort plus one
  * reduced aggregation — no self-join:
  *   1. change flags via lag() (a run = consecutive events with the same
  *      attribute value),
  *   2. run ids via a running sum of the flags (the islands technique,
  *      same mechanics as q30's sessionization),
  *   3. per-(key, run) reduce to one version row (valid_from = first event
  *      time, n_events),
  *   4. valid_to = lead(valid_from) over the REDUCED history (orders of
  *      magnitude smaller than the event stream); NULL marks the current
  *      version.
  * Timestamps are integer MICROSECONDS end to end: DuckDB reads the
  * parquet TIMESTAMP(NANOS) column at µs resolution (the same
  * engine-portable boundary q61's as-of join pins), so the engine
  * truncates its nanosecond longs to µs BEFORE ordering — sub-µs ordering
  * the oracle cannot see must not influence run segmentation. */
object Scd {

  def scd2History(s: SparkSession, dir: String): DataFrame = {
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_id"),
        col("event_type").as("status"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val lagStatus = lag(col("status"), 1).over(byUser)
    val runs = e
      .withColumn("chg",
        when(lagStatus.isNull || lagStatus =!= col("status"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val hist = runs.groupBy(col("user_id"), col("run_id"))
      .agg(min(col("status")).as("status"), // constant within a run
        min(col("us")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val ordered = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    hist
      .withColumn("valid_to", lead(col("valid_from"), 1).over(ordered))
      .select(col("user_id"), col("status"), col("valid_from"),
        col("valid_to"), col("n_events"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"))
  }
}
