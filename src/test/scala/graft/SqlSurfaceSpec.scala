package graft

import org.apache.spark.sql.functions._

/** Entry-point-B parity (SURVEY.md §3.2): the engine's tables are reachable
  * through plain `spark.sql` over registered views — the analogue of the
  * reference's Flink SQL apps (ProvinceStatsSqlApp/KeywordStatsApp).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views answer SQL identical to the DataFrame surface") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT r_name, count(DISTINCT o_orderkey) AS order_ct
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    val viaDf = operators.RefQueries.provinceStats(spark, sf)
      .groupBy(col("r_name"))
      .agg(sum(col("order_ct")).as("order_ct"))
      .orderBy(col("r_name")).collect()
    assert(viaSql.map(_.getString(0)).sameElements(viaDf.map(_.getString(0))))
    assert(viaSql.map(_.getLong(1)).sameElements(viaDf.map(_.getLong(1))))
  }

  test("tumbling SQL window over events (A4/A5 SQL form)") {
    Tables.registerAll(spark, sf)
    val rows = spark.sql(
      """SELECT ((ts div 1000000000) div 3600) * 3600 AS win, event_type,
        |  count(*) AS ct
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 5""".stripMargin).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(2) > 0))
  }

  test("SQL over a STREAMING view: entry point B in streaming mode") {
    // the reference's SQL apps run SQL on dynamic tables
    // (ProvinceStatsSqlApp.java:45-61); Spark twin: spark.sql over a
    // streaming temp view, windowed agg, append emission on watermark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    in.addData((ts(1000), "a", 1.0), (ts(2000), "a", 2.0), (ts(3000), "b", 4.0))
    in.toDF().toDF("rowtime", "k", "v")
      .withWatermark("rowtime", "2 seconds")
      .createOrReplaceTempView("stream_orders")
    val result = s.sql(
      """SELECT window(rowtime, '10 seconds').start AS stt, k,
        |  count(*) AS ct, sum(v) AS sv
        |FROM stream_orders GROUP BY window(rowtime, '10 seconds'), k""".stripMargin)
    val q = result.writeStream.format("memory").queryName("sqlstream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      in.addData((ts(60000), "z", 0.0)) // advance watermark past [0,10s)
      q.processAllAvailable()
      val rows = s.table("sqlstream").collect()
      assert(rows.length === 2)
      assert(rows.find(_.getAs[String]("k") == "a").get.getAs[Long]("ct") === 2L)
      assert(rows.find(_.getAs[String]("k") == "b").get.getAs[Double]("sv") === 4.0)
    } finally q.stop()
  }

  test("end-to-end DWD->DWS composition: raw JSON to windowed stats") {
    val s = spark
    import s.implicits._
    // ODS: raw JSON -> DWD: parse+split -> DWS: windowed visitor stats,
    // one lazy plan, no intermediate materialization
    def ev(mid: String, t: Long, isNew: String) =
      s"""{"common":{"mid":"$mid","vc":"v1","ch":"web","ar":"1","is_new":"$isNew"},
         |"page":{"page_id":"home","during_time":100},"ts":$t}"""
        .stripMargin.replace("\n", "")
    val raw = Seq(ev("a", 1000, "1"), ev("b", 2000, "0"), ev("a", 12000, "1")).toDF("value")
    val stats = streaming.WindowedStats.visitorStats(
      streaming.LogPipeline.pageLogs(streaming.LogPipeline.parseLogs(raw)))
    val byWindow = stats.orderBy(col("stt")).collect()
    assert(byWindow.length === 3) // (win0,is_new=1), (win0,is_new=0), (win1,is_new=1)
    assert(byWindow.map(_.getAs[Long]("pv_ct")).sum === 3)
  }
}
