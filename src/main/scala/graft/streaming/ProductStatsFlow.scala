package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** U1/P7/A1 — the reference's ProductStats assembly at full parity
  * (ProductStatsApp.java:76-312, bean/ProductStats.java:33-84): SEVEN
  * source streams are each mapped onto one unified metric schema with their
  * metric(s) seeded (P7), unioned (U1), then window-reduced per sku (A1)
  * with exact distinct order/paid/refund counts (the reference's three
  * orderIdSet/paidOrderIdSet/refundOrderIdSet HashSets).
  *
  * Metric surface (reference bean parity):
  *   counters  click_ct display_ct favor_ct cart_ct order_sku_num
  *             comment_ct good_comment_ct           (Long)
  *   amounts   order_amount payment_amount refund_amount (decimal-summed)
  *   distincts order_ct paid_order_ct refund_order_ct   (exact sets)
  *
  * Spark-first: the unified schema is a fixed select per source +
  * `unionByName`; the reduce is a tumbling-window aggregation whose partial
  * aggregation collapses the per-event seeds map-side, so the shuffle
  * carries near-aggregated rows — strictly less data than the reference's
  * record-at-a-time keyed reduce at the same key cardinality. The three
  * distinct-id columns ride as nullable strings; collect_set skips nulls,
  * so only rows that actually carry an id contribute set elements.
  */
object MetricUnion {

  /** Reference APPRAISE_GOOD (GmallConstant.java:24). */
  val AppraiseGood = "1201"

  private val idCols = Seq("order_id", "paid_order_id", "refund_order_id")
  private val counterCols = Seq("click_ct", "display_ct", "favor_ct", "cart_ct",
    "order_sku_num", "comment_ct", "good_comment_ct")
  private val amountCols = Seq("order_amount", "payment_amount", "refund_amount")

  /** Project any source onto the unified ProductStats seed schema: absent
    * ids stay null (excluded from distinct sets), absent metrics stay 0. */
  def seed(df: DataFrame, skuId: Column, ts: Column,
           ids: Map[String, Column] = Map.empty,
           values: Map[String, Column] = Map.empty): DataFrame = {
    val cols = Seq(skuId.cast("string").as("sku_id"), ts.as("event_ts")) ++
      idCols.map(c => ids.getOrElse(c, lit(null)).cast("string").as(c)) ++
      counterCols.map(m => values.getOrElse(m, lit(0L)).cast("long").as(m)) ++
      amountCols.map(m => values.getOrElse(m, lit(0.0)).cast("double").as(m))
    df.select(cols: _*)
  }

  /** F5: a click is a good_detail page view (ProductStatsApp.java:110-118). */
  def fromClicks(pages: DataFrame): DataFrame =
    seed(
      pages.filter(col("page.page_id") === "good_detail" && col("page.item").isNotNull),
      col("page.item"), col("event_ts"),
      values = Map("click_ct" -> lit(1L)))

  /** F6/X3: exploded displays of item_type sku_id (ProductStatsApp.java:121-137). */
  def fromDisplays(displays: DataFrame): DataFrame =
    seed(
      displays.filter(col("item_type") === "sku_id"),
      col("item"), timestamp_millis(col("ts")),
      values = Map("display_ct" -> lit(1L)))

  /** Favor seeding (ProductStatsApp.java:146-160): favor_ct 1 per dwd
    * favor-info row (columns: sku_id, create_time). */
  def fromFavors(favors: DataFrame): DataFrame =
    seed(favors, col("sku_id"), col("create_time"),
      values = Map("favor_ct" -> lit(1L)))

  /** Cart seeding (ProductStatsApp.java:163-173): cart_ct 1 per dwd
    * cart-info row (columns: sku_id, create_time). */
  def fromCarts(carts: DataFrame): DataFrame =
    seed(carts, col("sku_id"), col("create_time"),
      values = Map("cart_ct" -> lit(1L)))

  /** Order-wide seeding (ProductStatsApp.java:176-196): per detail row,
    * sku quantity + split amount + order id into the exact-distinct set.
    * `skuNum` defaults to 1 because the reduced OrderDetail model carries
    * no sku_num column (reference OrderWide.sku_num). */
  def fromOrders(orderWide: DataFrame, skuNum: Column = lit(1L)): DataFrame =
    seed(orderWide, col("skuId"), col("d_time"),
      ids = Map("order_id" -> col("orderId")),
      values = Map("order_sku_num" -> skuNum, "order_amount" -> col("splitAmount")))

  /** Payment-wide seeding (ProductStatsApp.java:199-212): split amount +
    * paid order id, from the payment ⋈ order-wide stream
    * ([[IntervalJoins.paymentWideFull]]). */
  def fromPayments(paymentWide: DataFrame): DataFrame =
    seed(paymentWide, col("skuId"), col("p_time"),
      ids = Map("paid_order_id" -> col("orderId")),
      values = Map("payment_amount" -> col("splitAmount")))

  /** Refund seeding (ProductStatsApp.java:214-228): refund amount + refund
    * order id (columns: sku_id, order_id, refund_amount, create_time). */
  def fromRefunds(refunds: DataFrame): DataFrame =
    seed(refunds, col("sku_id"), col("create_time"),
      ids = Map("refund_order_id" -> col("order_id")),
      values = Map("refund_amount" -> col("refund_amount")))

  /** Comment seeding (ProductStatsApp.java:230-246): comment_ct 1,
    * good_comment_ct 1 when appraise = APPRAISE_GOOD (columns: sku_id,
    * appraise, create_time). */
  def fromComments(comments: DataFrame): DataFrame =
    seed(comments, col("sku_id"), col("create_time"),
      values = Map(
        "comment_ct" -> lit(1L),
        "good_comment_ct" ->
          when(col("appraise") === AppraiseGood, 1L).otherwise(0L)))

  /** U1 + A1: union the seeded streams and window-reduce per sku — the
    * reference's full 13-metric reduce (ProductStatsApp.java:273-299) with
    * exact distinct order counts via collect_set (SURVEY §2.8; swap for
    * approx_count_distinct at 100 TB where tolerance allows). */
  def productStats(streams: Seq[DataFrame], windowDur: String = "10 seconds",
                   streaming: Boolean = false): DataFrame = {
    val unioned = streams.reduce(_.unionByName(_))
    WindowedStats.tumble(unioned, "event_ts", Seq("sku_id"),
      Seq(
        sum(col("click_ct")).as("click_ct"),
        sum(col("display_ct")).as("display_ct"),
        sum(col("favor_ct")).as("favor_ct"),
        sum(col("cart_ct")).as("cart_ct"),
        sum(col("order_sku_num")).as("order_sku_num"),
        sum(col("order_amount").cast("decimal(18,2)")).cast("double").as("order_amount"),
        size(collect_set(col("order_id"))).cast("long").as("order_ct"),
        sum(col("payment_amount").cast("decimal(18,2)")).cast("double").as("payment_amount"),
        size(collect_set(col("paid_order_id"))).cast("long").as("paid_order_ct"),
        sum(col("refund_amount").cast("decimal(18,2)")).cast("double").as("refund_amount"),
        size(collect_set(col("refund_order_id"))).cast("long").as("refund_order_ct"),
        sum(col("comment_ct")).as("comment_ct"),
        sum(col("good_comment_ct")).as("good_comment_ct")),
      windowDur, streaming = streaming)
  }
}
