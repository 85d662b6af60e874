package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of q83's rolling daily activity report — the
  * deployment shape of a trend dashboard: each micro-batch of events
  * updates two persisted state tables, and the report is re-derived from
  * state that is orders of magnitude smaller than the stream.
  *
  *  - `counts` (day_num, day, n_events): one row per day; a batch's
  *    per-day partials merge by sum. O(days) — metadata scale.
  *  - `pairs` (day_num, user_id): the distinct activity pairs that make
  *    exact per-day distinct actives incremental — a batch appends only
  *    pairs it hasn't seen (anti-join against the store, the
  *    refreshFeatureStore / incrementalDedup persistence contract).
  *    Bounded by true per-day active cardinality, the irreducible state
  *    of an EXACT distinct; partition by day at 100 TB so the anti-join
  *    prunes to touched days (or swap in the KMV sketch for bounded
  *    state, the q51 trade).
  *
  * Per-batch cost is O(batch + days), never O(stream). The report stage
  * is shared with batch q83 (`RefQueries.rollingDailyFrom`), so streamed
  * == batch is structural, not coincidental — the spec proves it on the
  * real stream. */
object RollingStream {

  /** Per-day partials of one micro-batch of (user_id, sec) events. */
  private def batchDaily(batch: DataFrame): DataFrame =
    batch.select(expr("sec div 86400").as("day_num"), col("sec"),
        col("user_id"))
      .groupBy(col("day_num"))
      .agg(min(date_format(timestamp_seconds(col("sec")), "yyyy-MM-dd"))
          .as("day"),
        count(lit(1)).as("n_events"))

  /** Merge a batch into the day-counts table (one row per day). */
  def mergeCounts(counts: DataFrame, batch: DataFrame): DataFrame =
    counts.unionByName(batchDaily(batch))
      .groupBy(col("day_num"))
      .agg(min(col("day")).as("day"), sum(col("n_events")).as("n_events"))

  /** Merge a batch into the distinct (day, user) pairs table: append
    * only unseen pairs. */
  def mergePairs(pairs: DataFrame, batch: DataFrame): DataFrame = {
    val bPairs = batch
      .select(expr("sec div 86400").as("day_num"), col("user_id"))
      .distinct()
    pairs.unionByName(bPairs.join(pairs, Seq("day_num", "user_id"),
      "left_anti"))
  }

  /** The rolling report off the maintained state — identical stage to
    * batch q83. */
  def report(counts: DataFrame, pairs: DataFrame): DataFrame = {
    val actives = pairs.groupBy(col("day_num"))
      .agg(count(lit(1)).as("n_actives"))
    graft.operators.RefQueries.rollingDailyFrom(
      counts.join(actives, Seq("day_num")))
  }

  def emptyCounts(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("day_num", LongType),
        StructField("day", StringType), StructField("n_events", LongType))))
  }

  def emptyPairs(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("day_num", LongType),
        StructField("user_id", LongType))))
  }
}
