package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental last-touch attribution — the deployment shape of q93:
  * per-user latest-touch state maintained across micro-batches, each
  * batch's purchases credited on arrival, so the channel-revenue panel
  * updates per trigger without rescanning the touch history.
  *
  * State is ONE row per user — (t_us, t_eid, t_type), the winner of the
  * same (us, event_id) struct-max reduce q93 applies, so a same-µs
  * view/click tie resolves identically whether the two touches arrive
  * in one batch or split across two. Per-batch work reads the batch
  * plus the state rows of touched users (the ScdStream keyed-upsert
  * property); emitted attributions are final — no retraction channel.
  *
  * Contract: ingest is time-ordered with batch boundaries on µs edges
  * (no single microsecond straddles two batches). q93 credits a touch
  * at the purchase's OWN µs, so a same-µs touch landing in a later
  * batch than its purchase would be unseeable by then — the boundary
  * rule makes the frontier µs atomic. Within that contract the fold is
  * exact: streamed attributions equal batch q93 row-for-row
  * (AttributionStreamSpec, 4 uneven splits of the real stream). */
object AttributionStream {

  /** Merge a micro-batch of (event_id, user_id, us, event_type, value)
    * into per-user touch state. Returns (new state, attributed purchases
    * of THIS batch as (event_id, user_id, us, value, channel)). */
  def mergeBatch(state: DataFrame, batch: DataFrame,
                 lookbackUs: Long = 72L * 3600 * 1000000L)
      : (DataFrame, DataFrame) = {
    // only touched users' state participates in the merge; everyone
    // else's row rides through untouched (the foreachBatch MERGE shape —
    // a keyed store reads/writes only the batch's keys)
    val touched = batch.select(col("user_id")).distinct()
    val batchTouches = batch
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("us"), col("event_id"), col("event_type"))
    val stateTouches = state.join(touched, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("t_us").as("us"),
        col("t_eid").as("event_id"), col("t_type").as("event_type"))
    // one candidate per (user, µs): the struct max makes the same-µs
    // winner a pure function of the data, batch split or not
    val candidates = batchTouches.unionByName(stateTouches)
      .groupBy(col("user_id"), col("us"))
      .agg(max(struct(col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("us"), col("m.event_id").as("event_id"),
        col("m.event_type").as("touch_type"))
    val newState = state.join(touched, Seq("user_id"), "left_anti")
      .unionByName(candidates
        .groupBy(col("user_id"))
        .agg(max(struct(col("us"), col("event_id"), col("touch_type"))).as("m"))
        .select(col("user_id"), col("m.us").as("t_us"),
          col("m.event_id").as("t_eid"), col("m.touch_type").as("t_type")))
    val purchases = batch.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"), col("value"))
    val attributed = graft.operators.AsOf.asOfJoin(purchases,
        candidates.select(col("user_id"), col("us"), col("touch_type")),
        Seq("user_id"), "us", Seq("touch_type"))
      .withColumn("channel",
        when(col("asof_ts").isNotNull &&
             col("us") - col("asof_ts") <= lookbackUs,
          col("touch_type_asof")).otherwise(lit("organic")))
      .select(col("event_id"), col("user_id"), col("us"), col("value"),
        col("channel"))
    (newState, attributed)
  }

  def emptyState(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("user_id", LongType), StructField("t_us", LongType),
        StructField("t_eid", LongType), StructField("t_type", StringType))))
  }
}

/** Incremental MULTI-touch attribution — the deployment shape of q144:
  * per-user in-window touch state maintained across micro-batches; each
  * batch's purchases receive their full U-shaped credit split on arrival.
  *
  * State holds every touch newer than (frontier − lookback) — bounded by
  * lookback × touch rate per user, pruned each trigger. Under the same
  * ordered-ingest / µs-atomic-boundary contract as [[AttributionStream]],
  * a purchase's touch window is complete when it arrives, so its credits
  * (position classes included) are FINAL on emission — no retraction
  * channel. Credit arithmetic is the exact stage SHARED with batch q144
  * ([[graft.operators.RefQueries.multiTouchCredits]]), so streamed ==
  * batch is structural (MultiTouchStreamSpec folds the real stream in
  * uneven splits and matches the batch report bit-for-bit). */
object MultiTouchStream {
  import graft.operators.RefQueries

  /** Merge a micro-batch of (event_id, user_id, us, event_type, value).
    * Returns (new touch state, this batch's per-credit rows). */
  def mergeBatch(state: DataFrame, batch: DataFrame,
                 lookbackUs: Long = 72L * 3600 * 1000000L)
      : (DataFrame, DataFrame) = {
    val batchTouches = batch
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("tuser"), col("us").as("tus"),
        col("event_id").as("tid"), col("event_type").as("touch_type"))
    val allTouches = state.unionByName(batchTouches)
    val purchases = batch.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("puser"),
        col("us").as("pus"), col("value"))
    val credits = RefQueries.multiTouchCredits(
      RefQueries.multiTouchJoin(purchases, allTouches, lookbackUs))
    // prune: a touch at or before (frontier − lookback) can never fall in
    // a future purchase's window (future pus > frontier under the
    // boundary contract), so state stays lookback-bounded. An EMPTY
    // trigger (routine in streaming) has max(us)=NULL — the coalesce
    // makes the cutoff -∞ so the filter keeps every state row instead
    // of NULL-dropping all of it.
    val frontier = batch.agg(max(col("us")).as("frontier"))
    val newState = allTouches.crossJoin(broadcast(frontier))
      .filter(col("tus") >
        coalesce(col("frontier") - lookbackUs, lit(Long.MinValue)))
      .select(col("tuser"), col("tus"), col("tid"), col("touch_type"))
    (newState, credits)
  }

  def emptyState(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("tuser", LongType), StructField("tus", LongType),
        StructField("tid", LongType), StructField("touch_type", StringType))))
  }
}
