package graft.streaming

import graft.SparkSpec
import graft.streaming.Model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The reference's full DWM→DWS lineage in ONE streaming query:
  * order ⋈ detail interval join (stream-stream, stateful) feeding a
  * tumbling-window aggregation (stateful) — ProvinceStatsSqlApp's exact
  * chain (OrderWideApp → ProvinceStatsSqlApp, collapsed without the Kafka
  * hop as per SURVEY.md §7.4-5). Exercises Spark's chained-stateful-
  * operator support with watermark propagation through the join.
  */
class ChainedStatefulSpec extends SparkSpec {

  test("stream-stream interval join chained into windowed aggregation") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val orders = MemoryStream[OrderInfo]
    val details = MemoryStream[OrderDetail]
    val t0 = 1000000L
    orders.addData(
      OrderInfo(1L, 100L, 50.0, ts(t0 + 1000)),
      OrderInfo(2L, 200L, 70.0, ts(t0 + 2000)))
    details.addData(
      OrderDetail(11L, 1L, 7L, 20.0, ts(t0 + 1002)),
      OrderDetail(12L, 1L, 8L, 30.0, ts(t0 + 1003)),
      OrderDetail(21L, 2L, 7L, 70.0, ts(t0 + 2001)))
    val wide = IntervalJoins.orderWide(orders.toDS(), details.toDS(), bandMs = 5)
    // DWS: per-sku 10s tumble over the joined wide stream
    val stats = wide
      .groupBy(window(col("d_time"), "10 seconds"), col("skuId"))
      .agg(sum(col("splitAmount").cast("decimal(18,2)")).cast("double").as("amount"),
        count(lit(1)).as("ct"))
    val q = stats.writeStream.format("memory").queryName("chain")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // advance both watermarks past the window end
      orders.addData(OrderInfo(9L, 1L, 1.0, ts(t0 + 100000)))
      details.addData(OrderDetail(99L, 9L, 1L, 1.0, ts(t0 + 100000)))
      q.processAllAvailable()
      val rows = s.table("chain").collect()
      assert(rows.nonEmpty, "chained stateful query emitted nothing")
      val sku7 = rows.find(_.getAs[Long]("skuId") == 7L).get
      assert(sku7.getAs[Double]("amount") === 90.0) // 20 + 70
      assert(sku7.getAs[Long]("ct") === 2L)
      assert(rows.find(_.getAs[Long]("skuId") == 8L).get.getAs[Double]("amount") === 30.0)
    } finally q.stop()
  }

  test("X1 dirty-data branch quarantines unparseable records") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      """{"common":{"mid":"m1"},"page":{"page_id":"home"},"ts":1000}""",
      """not json at all{{{""",
      """{"some":"other","shape":"entirely"}""",
      // structurally valid but NO ts: cannot enter event-time processing
      """{"common":{"mid":"m2"},"page":{"page_id":"home"}}""").toDF("value")
    assert(LogPipeline.dirtyLogs(raw).count() === 3)
    val parsed = LogPipeline.parseLogs(raw)
    assert(LogPipeline.pageLogs(parsed).filter(col("common.mid") === "m1").count() === 1)
  }
}
