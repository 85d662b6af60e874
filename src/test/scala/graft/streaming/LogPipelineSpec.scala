package graft.streaming

import graft.SparkSpec

class LogPipelineSpec extends SparkSpec {

  private val startJson =
    """{"common":{"mid":"mid_1","uid":"u1","vc":"v2.1","ch":"appstore","ar":"110000","is_new":"1"},
      |"start":{"entry":"icon","open_ad_id":1,"loading_time":1000},"ts":1613728850000}"""
      .stripMargin.replace("\n", "")
  private val pageJson =
    """{"common":{"mid":"mid_2","uid":"u2","vc":"v2.1","ch":"web","ar":"310000","is_new":"0"},
      |"page":{"page_id":"good_detail","last_page_id":"home","item":"10","item_type":"sku_id","during_time":12000},
      |"displays":[{"display_type":"query","item":"3","item_type":"sku_id","order":1},
      |{"display_type":"promotion","item":"6","item_type":"sku_id","order":2}],
      |"ts":1613728851000}""".stripMargin.replace("\n", "")

  test("X1/X3/P1: log split and display explode (BaseLogAPP.java:141-198)") {
    val s = spark
    import s.implicits._
    val raw = Seq(startJson, pageJson).toDF("value")
    val parsed = LogPipeline.parseLogs(raw)

    assert(LogPipeline.startLogs(parsed).count() === 1)
    assert(LogPipeline.pageLogs(parsed).count() === 1)
    val displays = LogPipeline.displayLogs(parsed).collect()
    assert(displays.length === 2)
    // page_id attached to each exploded display (BaseLogAPP.java:170-177)
    assert(displays.forall(_.getAs[String]("page_id") == "good_detail"))
    assert(displays.map(_.getAs[String]("item")).toSet === Set("3", "6"))
  }

  test("F1/P5: CDC clean filter and bootstrap normalization") {
    val s = spark
    import s.implicits._
    val cdcJson = Seq(
      """{"database":"gmall","table":"order_info","type":"bootstrap-insert","ts":1,"data":{"id":"1","user_id":"5","total_amount":"9.90"}}""",
      """{"database":"gmall","table":null,"type":"insert","ts":2,"data":{"id":"2","x":"y","z":"w"}}""",
      """{"database":"gmall","table":"t","type":"insert","ts":3,"data":{"id":"3"}}""").toDF("value")
    import org.apache.spark.sql.functions._
    val parsed = cdcJson
      .select(from_json(col("value"), LogPipeline.cdcSchema).as("c")).select(col("c.*"))
    val cleaned = LogPipeline.cdcClean(parsed)
    assert(cleaned.count() === 1) // null table and len(data)<3 dropped
    assert(cleaned.select(LogPipeline.normalizeOp(col("type"))).head().getString(0) === "insert")
  }
}
