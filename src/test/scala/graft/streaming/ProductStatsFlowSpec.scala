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
    assert(r.getAs[Double]("click_ct") === 2.0)
    assert(r.getAs[Double]("display_ct") === 1.0)
    assert(r.getAs[Double]("order_ct") === 3.0)       // 3 detail rows
    assert(r.getAs[Int]("order_distinct_ct") === 2)   // but 2 distinct orders
    assert(r.getAs[Double]("order_amount") === 95.0)
    assert(stats.filter(col("sku_id") === "77").head().getAs[Double]("display_ct") === 1.0)
  }
}
