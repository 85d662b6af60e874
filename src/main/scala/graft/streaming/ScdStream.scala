package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental SCD2 maintenance — the production shape of q71's batch
  * history build: each micro-batch of change events EXTENDS or CLOSES
  * version rows instead of recomputing the history from the full stream.
  * The reference's dim sink upserts current values by pk
  * (DimSink.java:43-91, SCD1 — our K3 `DynamicRouting.upsertDims`); this
  * generalizes the same keyed-upsert machinery to type 2: the upsert key
  * is (user_id, run_id) and the merge may close the previously-open
  * version and open new ones. CDC tombstones (Maxwell delete ops, the
  * third leg of the op triple the reference's router reads —
  * TableProcessFunction.java:185-193) are first-class: a delete closes
  * the open version at the tombstone's timestamp and opens nothing
  * (q80's batch semantics, `Scd.scd2HistoryCdcFrom`).
  *
  * Contract: events arrive time-ordered per key across batches (bounded
  * disorder is the upstream watermark's job — T3/T4); a RUN may span
  * batches (the mid-run split the spec exercises). Per-batch work reads
  * only the batch plus the OPEN version row and last run id of touched
  * keys — closed history is never re-read or re-written, so a batch's
  * cost is O(batch), not O(history): the property that makes SCD2
  * maintenance viable on an unbounded stream.
  */
object ScdStream {

  /** Merge one micro-batch of upsert-only change events (user_id, us,
    * event_id, status) — the op-free surface the q71 twin uses. */
  def mergeBatch(hist: DataFrame, batch: DataFrame): DataFrame =
    mergeBatchCdc(hist, batch.withColumn("op", lit("u")))

  /** Merge one micro-batch of CDC change events (user_id, us, event_id,
    * status, op) into an existing history (the q71 schema + run_id).
    * op = 'u' upsert / 'd' delete. Returns the full new history; the
    * rows whose values can differ from `hist` are exactly the touched
    * keys' tail (the keyed-upsert delta). Tombstone semantics mirror
    * `Scd.scd2HistoryCdcFrom`: the first tombstone after an open run
    * closes it at the tombstone's us, later tombstones no-op, an upsert
    * after a tombstone opens a NEW run even at the same status. */
  def mergeBatchCdc(hist: DataFrame, batch: DataFrame): DataFrame = {
    val open = hist.filter(col("is_current"))
      .select(col("user_id"), col("status").as("open_status"),
        col("valid_from").as("open_from"), col("n_events").as("open_n"),
        col("run_id").as("open_run"))
    // run ids must keep increasing after a tombstone closed the whole
    // history (no open row, but closed run ids exist): seed the counter
    // from the key's LAST run id, open or closed
    val lastRun = hist.groupBy(col("user_id"))
      .agg(max(col("run_id")).as("last_run"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val seeded = batch.join(open, Seq("user_id"), "left")
      .join(lastRun, Seq("user_id"), "left")
    // the open version seeds the first batch row's change flag (an open
    // run behaves like a preceding live row of open_status); WITHIN the
    // batch the previous row's own (op, status) apply — a tombstone's
    // null status must read as "prev was a delete", not as the open seed
    val lagOp = lag(col("op"), 1).over(byUser)
    val prevOp = coalesce(lagOp,
      when(col("open_status").isNotNull, lit("u")))
    val prevStatus = when(lagOp.isNotNull, lag(col("status"), 1).over(byUser))
      .otherwise(col("open_status"))
    val runs = seeded
      .withColumn("chg",
        when(col("op") === "d", 0L)
          .when(prevOp.isNull || prevOp === "d" ||
            prevStatus =!= col("status"), 1L)
          .otherwise(0L))
      .withColumn("run_id",
        coalesce(col("open_run"), col("last_run"), lit(0L)) +
          sum(col("chg")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agg = runs.groupBy(col("user_id"), col("run_id"))
      .agg(min(when(col("op") === "u", col("status"))).as("status"),
        min(when(col("op") === "u", col("us"))).as("valid_from"),
        count(when(col("op") === "u", 1)).as("live_n"),
        min(when(col("op") === "d", col("us"))).as("del_at"),
        min(col("open_status")).as("open_status"),
        min(col("open_from")).as("open_from"),
        min(col("open_n")).as("open_n"),
        min(col("open_run")).as("open_run"))
    // a run continuing the open version keeps its valid_from/status and
    // accumulates its event count — including a PURE-tombstone group that
    // only closes it; groups with no live rows and no open run to close
    // are deletes of nonexistent keys: no-ops, dropped
    val merged = agg
      .filter(col("live_n") > 0 || col("run_id") === col("open_run"))
      .select(col("user_id"), col("run_id"),
        when(col("run_id") === col("open_run"), col("open_status"))
          .otherwise(col("status")).as("status"),
        when(col("run_id") === col("open_run"), col("open_from"))
          .otherwise(col("valid_from")).as("valid_from"),
        (col("live_n") + when(col("run_id") === col("open_run"),
          col("open_n")).otherwise(lit(0L))).as("n_events"),
        col("del_at"))
    val touched = batch.select(col("user_id")).distinct()
    // the open row of a touched key whose run was NOT continued must be
    // re-chained (its valid_to becomes the first new version's open time)
    val openToClose = hist.filter(col("is_current"))
      .join(touched, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("run_id"), col("status"),
        col("valid_from"), col("n_events"))
      .join(merged.select(col("user_id"), col("run_id")),
        Seq("user_id", "run_id"), "left_anti")
      .withColumn("del_at", lit(null).cast("long"))
    val tailW = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("run_id"))
    // a tombstone-closed run's valid_to is the tombstone time — the gap
    // to the next version's valid_from IS the deletion interval
    val tail = merged.unionByName(openToClose)
      .withColumn("valid_to",
        coalesce(col("del_at"), lead(col("valid_from"), 1).over(tailW)))
      .withColumn("is_current", col("valid_to").isNull)
      .select(histCols: _*)
    // untouched: every closed row, plus open rows of keys absent from the
    // batch — carried through byte-identical (a keyed store would not
    // rewrite them at all)
    val untouched = hist.filter(!col("is_current"))
      .unionByName(hist.filter(col("is_current"))
        .join(touched, Seq("user_id"), "left_anti"))
      .select(histCols: _*)
    untouched.unionByName(tail)
  }

  private val histCols = Seq(col("user_id"), col("status"),
    col("valid_from"), col("valid_to"), col("n_events"),
    col("is_current"), col("run_id"))

  /** An empty history frame with the merge schema. */
  def emptyHistory(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("user_id", LongType), StructField("status", StringType),
        StructField("valid_from", LongType), StructField("valid_to", LongType),
        StructField("n_events", LongType), StructField("is_current", BooleanType),
        StructField("run_id", LongType))))
  }
}
