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
  * version and open new ones.
  *
  * Contract: events arrive time-ordered per key across batches (bounded
  * disorder is the upstream watermark's job — T3/T4); a RUN may span
  * batches (the mid-run split the spec exercises). Per-batch work reads
  * only the batch plus the OPEN version row of touched keys — closed
  * history is never re-read or re-written, so a batch's cost is
  * O(batch), not O(history): the property that makes SCD2 maintenance
  * viable on an unbounded stream.
  */
object ScdStream {

  /** Merge one micro-batch of change events (user_id, us, event_id,
    * status) into an existing history (the q71 schema + run_id). Returns
    * the full new history; the rows whose values can differ from `hist`
    * are exactly the touched keys' tail (the keyed-upsert delta). */
  def mergeBatch(hist: DataFrame, batch: DataFrame): DataFrame = {
    val open = hist.filter(col("is_current"))
      .select(col("user_id"), col("status").as("open_status"),
        col("valid_from").as("open_from"), col("n_events").as("open_n"),
        col("run_id").as("open_run"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    // the open version's status seeds the first batch row's change flag:
    // same status -> the run CONTINUES (no new version), different or no
    // open version -> a new run begins
    val seeded = batch.join(open, Seq("user_id"), "left")
    val prev = coalesce(lag(col("status"), 1).over(byUser), col("open_status"))
    val runs = seeded
      .withColumn("chg",
        when(prev.isNull || prev =!= col("status"), 1L).otherwise(0L))
      .withColumn("run_id", coalesce(col("open_run"), lit(0L)) +
        sum(col("chg"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agg = runs.groupBy(col("user_id"), col("run_id"))
      .agg(min(col("status")).as("status"), min(col("us")).as("valid_from"),
        count(lit(1)).as("n_events"))
    // a run continuing the open version keeps its valid_from and
    // accumulates its event count
    val merged = agg.join(open, Seq("user_id"), "left")
      .select(col("user_id"), col("run_id"), col("status"),
        when(col("run_id") === col("open_run"), col("open_from"))
          .otherwise(col("valid_from")).as("valid_from"),
        (col("n_events") + when(col("run_id") === col("open_run"),
          col("open_n")).otherwise(lit(0L))).as("n_events"))
    val touched = merged.select(col("user_id")).distinct()
    // the open row of a touched key whose run was NOT continued must be
    // re-chained (its valid_to becomes the first new version's open time)
    val openToClose = hist.filter(col("is_current"))
      .join(touched, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("run_id"), col("status"),
        col("valid_from"), col("n_events"))
      .join(merged.select(col("user_id"), col("run_id")),
        Seq("user_id", "run_id"), "left_anti")
    val tailW = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("run_id"))
    val tail = merged.unionByName(openToClose)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(tailW))
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
