package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductStatsFlowSpec extends SparkSpec {

  test("U1/P7/A1: multi-stream metric union with exact distinct orders") {
    val s = spark
    import s.implicits._
    def page(mid: String, item: String, tsMs: Long) =
      s"""{"common":{"mid":"$mid"},"page":{"page_id":"good_detail","item":"$item","during_time":5},"ts":$tsMs}"""
    def disp(mid: String, item: String, tsMs: Long) =
      s"""{"common":{"mid":"$mid"},"page":{"page_id":"home","during_time":5},
         |"displays":[{"display_type":"query","item":"$item","item_type":"sku_id","order":1}],"ts":$tsMs}"""
        .stripMargin.replace("\n", "")
    val parsed = LogPipeline.parseLogs(
      Seq(page("m1", "10", 1000), page("m2", "10", 2000), disp("m1", "10", 3000),
          disp("m2", "77", 4000)).toDF("value"))

    val orders = Seq(
      (1L, 10L, 25.0, ts(5000L)), (1L, 10L, 30.0, ts(6000L)), // same order, 2 details
      (2L, 10L, 40.0, ts(7000L)))
      .toDF("orderId", "skuId", "splitAmount", "d_time")

    val stats = MetricUnion.productStats(Seq(
      MetricUnion.fromClicks(LogPipeline.pageLogs(parsed)),
      MetricUnion.fromDisplays(LogPipeline.displayLogs(parsed)),
      MetricUnion.fromOrders(orders)))

    val sku10 = stats.filter(col("sku_id") === "10").collect()
    assert(sku10.length === 1) // one 10s window
    val r = sku10.head
    assert(r.getAs[Long]("click_ct") === 2L)
    assert(r.getAs[Long]("display_ct") === 1L)
    assert(r.getAs[Long]("order_sku_num") === 3L)  // 3 detail rows × default 1
    assert(r.getAs[Long]("order_ct") === 2L)       // reference: DISTINCT orders
    assert(r.getAs[Double]("order_amount") === 95.0)
    // untouched metrics stay zero, not null
    assert(r.getAs[Long]("favor_ct") === 0L)
    assert(r.getAs[Double]("refund_amount") === 0.0)
    assert(r.getAs[Long]("paid_order_ct") === 0L)
    assert(stats.filter(col("sku_id") === "77").head().getAs[Long]("display_ct") === 1L)
  }

  test("P7 parity: favor/cart/payment/refund/comment seeds (ProductStatsApp.java:146-246)") {
    val s = spark
    import s.implicits._
    val favors = Seq(("10", ts(1000L)), ("10", ts(2000L)))
      .toDF("sku_id", "create_time")
    val carts = Seq(("10", ts(3000L))).toDF("sku_id", "create_time")
    // paymentWideFull shape: two details of the same paid order
    val pays = Seq((1L, 10L, 25.0, ts(4000L)), (1L, 10L, 30.0, ts(4500L)))
      .toDF("orderId", "skuId", "splitAmount", "p_time")
    val refunds = Seq(("10", "7", 12.5, ts(5000L)))
      .toDF("sku_id", "order_id", "refund_amount", "create_time")
    val comments = Seq(
      ("10", MetricUnion.AppraiseGood, ts(6000L)),
      ("10", "1203", ts(7000L)))
      .toDF("sku_id", "appraise", "create_time")

    val stats = MetricUnion.productStats(Seq(
      MetricUnion.fromFavors(favors),
      MetricUnion.fromCarts(carts),
      MetricUnion.fromPayments(pays),
      MetricUnion.fromRefunds(refunds),
      MetricUnion.fromComments(comments)))

    val r = stats.filter(col("sku_id") === "10").head()
    assert(r.getAs[Long]("favor_ct") === 2L)
    assert(r.getAs[Long]("cart_ct") === 1L)
    assert(r.getAs[Double]("payment_amount") === 55.0)
    assert(r.getAs[Long]("paid_order_ct") === 1L)    // distinct orders, not rows
    assert(r.getAs[Double]("refund_amount") === 12.5)
    assert(r.getAs[Long]("refund_order_ct") === 1L)
    assert(r.getAs[Long]("comment_ct") === 2L)
    assert(r.getAs[Long]("good_comment_ct") === 1L)  // only APPRAISE_GOOD
    assert(r.getAs[Long]("click_ct") === 0L)
  }

  test("A1 streaming: metric union emits closed windows in append mode") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val orders = MemoryStream[(Long, Long, Double, java.sql.Timestamp)]
    val seeds = MetricUnion.fromOrders(
      orders.toDF().toDF("orderId", "skuId", "splitAmount", "d_time"))
    val stats = MetricUnion.productStats(Seq(seeds), streaming = true)
    // nonzero event times (epoch-0 sits at the initial watermark); the late
    // 60 s event advances the watermark past the first 10 s window's end
    orders.addData((1L, 10L, 25.0, ts(12000L)), (2L, 10L, 30.0, ts(13000L)))
    val q = stats.writeStream.format("memory").queryName("ps_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      q.processAllAvailable()
      orders.addData((3L, 99L, 1.0, ts(60000L))) // watermark pusher
      q.processAllAvailable()
      val rows = s.table("ps_stream").collect()
      assert(rows.length === 1) // only the closed [10s,20s) window emitted
      val r = rows.head
      assert(r.getAs[String]("sku_id") === "10")
      assert(r.getAs[Long]("order_ct") === 2L)
      assert(r.getAs[Double]("order_amount") === 55.0)
      assert(r.getAs[String]("stt") === "1970-01-01 00:00:10")
    } finally q.stop()
  }

  test("J2 parity: paymentWideFull joins payment to order-wide within band") {
    val s = spark
    import s.implicits._
    val payments = Seq(
      Model.PaymentInfo(100L, 1L, 55.0, ts(10000L)),   // within 30 min
      Model.PaymentInfo(101L, 2L, 40.0, ts(7200000L))) // 2 h later -> dropped
      .toDS()
    val orderWide = Seq(
      (1L, 10L, 25.0, ts(5000L)), (1L, 11L, 30.0, ts(6000L)),
      (2L, 12L, 40.0, ts(7000L)))
      .toDF("orderId", "skuId", "splitAmount", "d_time")
    val wide = IntervalJoins.paymentWideFull(payments, orderWide).collect()
    assert(wide.length === 2) // order 1's two details; order 2 out of band
    assert(wide.map(_.getAs[Long]("skuId")).toSet === Set(10L, 11L))
    assert(wide.forall(_.getAs[Long]("orderId") === 1L))
  }
}
