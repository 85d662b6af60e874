package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** U1/P7/A1 — the reference's ProductStats assembly
  * (ProductStatsApp.java:96-312): N source streams are each mapped onto one
  * unified metric schema with a single metric seeded to 1 (P7), unioned
  * (U1), then window-reduced per sku (A1) with exact distinct order counts.
  *
  * Spark-first: the unified schema is a fixed select per source +
  * `unionByName`; the reduce is a tumbling-window aggregation whose partial
  * aggregation collapses the per-event seeds map-side, so the shuffle
  * carries near-aggregated rows — strictly less data than the reference's
  * record-at-a-time keyed reduce at the same key cardinality.
  */
object MetricUnion {

  private val metricCols =
    Seq("click_ct", "display_ct", "cart_ct", "order_ct", "order_amount")

  private def seeded(df: DataFrame, skuId: org.apache.spark.sql.Column,
                     ts: org.apache.spark.sql.Column,
                     orderId: org.apache.spark.sql.Column,
                     values: Map[String, org.apache.spark.sql.Column]): DataFrame = {
    val cols = Seq(skuId.as("sku_id"), ts.as("event_ts"), orderId.as("order_id")) ++
      metricCols.map(m => values.getOrElse(m, lit(0.0)).cast("double").as(m))
    df.select(cols: _*)
  }

  /** F5: a click is a good_detail page view (ProductStatsApp.java:110-118). */
  def fromClicks(pages: DataFrame): DataFrame =
    seeded(
      pages.filter(col("page.page_id") === "good_detail" && col("page.item").isNotNull),
      col("page.item"), col("event_ts"), lit(null).cast("string"),
      Map("click_ct" -> lit(1.0)))

  /** F6/X3: exploded displays of item_type sku_id (ProductStatsApp.java:121-137). */
  def fromDisplays(displays: DataFrame): DataFrame =
    seeded(
      displays.filter(col("item_type") === "sku_id"),
      col("item"), timestamp_millis(col("ts")), lit(null).cast("string"),
      Map("display_ct" -> lit(1.0)))

  /** Order stream seeding (ProductStatsApp.java:173-206): per order-detail
    * row, order metric 1 + split amount; order_id retained for the exact
    * distinct count. */
  def fromOrders(orderWide: DataFrame): DataFrame =
    seeded(orderWide,
      col("skuId").cast("string"), col("d_time"), col("orderId").cast("string"),
      Map("order_ct" -> lit(1.0), "order_amount" -> col("splitAmount")))

  /** U1 + A1: union the seeded streams and window-reduce per sku with the
    * exact distinct order count (collect_set, as declared in SURVEY §2.8). */
  def productStats(streams: Seq[DataFrame], windowDur: String = "10 seconds",
                   streaming: Boolean = false): DataFrame = {
    val unioned = streams.reduce(_.unionByName(_))
    WindowedStats.tumble(unioned, "event_ts", Seq("sku_id"),
      Seq(
        sum(col("click_ct")).as("click_ct"),
        sum(col("display_ct")).as("display_ct"),
        sum(col("cart_ct")).as("cart_ct"),
        sum(col("order_ct")).as("order_ct"),
        sum(col("order_amount").cast("decimal(18,2)")).cast("double").as("order_amount"),
        size(collect_set(col("order_id"))).as("order_distinct_ct")), // nulls skipped
      windowDur, streaming = streaming)
  }
}
