package graft.apps

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drives [[Serve]] over a freshly-written warehouse dir end-to-end:
  * registration skips absent tables, the GMV lookup equals the mapper
  * SQL's hand-computed answer (date filter + null-sum contract), the
  * keyword panel orders/limits, and the warm cached path answers inside
  * the documented latency budget. */
class ServeSpec extends SparkSpec {

  private def writeWarehouse(): String = {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-serve").toString
    // the production layout: writeDws adds the dt partition column, the
    // one Serve's date lookups prune on
    graft.sinks.Warehouse.writeDws(
      Seq(
        ("2021-02-27 10:00:00", 101L, 120.50, 3L),
        ("2021-02-27 10:00:10", 102L, 79.50, 1L),
        ("2021-02-28 09:00:00", 101L, 42.00, 2L))
        .toDF("stt", "sku_id", "order_amount", "click_ct")
        .withColumn("stt", col("stt").cast("timestamp")),
      s"$dir/dws_product_stats")
    Seq(
      ("2021-02-27 10:00:00", "phone", 5L, "SEARCH"),
      ("2021-02-27 10:00:10", "phone", 2L, "SEARCH"),
      ("2021-02-27 10:00:10", "laptop", 4L, "SEARCH"),
      ("2021-02-28 11:00:00", "tv", 9L, "SEARCH"))
      .toDF("stt", "keyword", "ct", "source")
      .withColumn("stt", col("stt").cast("timestamp"))
      // plain parquet, NO dt column: exercises Serve's fallback for DWS
      // tables written outside writeDws (stt row-filter only)
      .write.parquet(s"$dir/dws_keyword_stats")
    dir
  }

  test("gmv's uncached scan prunes to the dt partition (ADVICE r11)") {
    val serve = Serve(spark, writeWarehouse())
    // the exact predicate shape gmv issues for a writeDws table: the dt
    // conjunct must reach the scan's PartitionFilters, not ride as a
    // post-scan row filter
    val plan = serve.sql(
      """SELECT sum(order_amount) FROM dws_product_stats
        |WHERE dt = '2021-02-27'
        |  AND CAST(date_format(stt, 'yyyyMMdd') AS INT) = 20210227"""
        .stripMargin).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    val pf = plan.split("PartitionFilters:")(1).split("]")(0)
    assert(pf.contains("dt"), plan)
    assert(pf.contains("2021-02-27"), plan)
  }

  test("registers only present DWS tables; gmv matches the mapper SQL") {
    val serve = Serve(spark, writeWarehouse())
    assert(serve.registered === Seq("dws_product_stats", "dws_keyword_stats"))
    // sum(order_amount) where toYYYYMMDD(stt) = date
    assert(serve.gmv(20210227).doubleValue() === 200.0)
    assert(serve.gmv(20210228).doubleValue() === 42.0)
    // no rows for the date -> serves 0, never null (controller contract)
    assert(serve.gmv(20990101).doubleValue() === 0.0)
  }

  test("keywordTop aggregates, orders desc, limits") {
    val serve = Serve(spark, writeWarehouse())
    val top = serve.keywordTop(20210227, limit = 1).collect()
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("phone", 7L)))
    val all = serve.keywordTop(20210227).collect()
    assert(all.map(_.getString(0)).toSeq === Seq("phone", "laptop"))
  }

  test("warm cached path: repeated lookups answer inside the budget") {
    val serve = Serve(spark, writeWarehouse())
    serve.cache(eager = true)
    try {
      val t0 = System.nanoTime()
      (1 to 5).foreach(_ => serve.gmv(20210227))
      val perLookupMs = (System.nanoTime() - t0) / 1e6 / 5
      // documented budget: in-memory scan-aggregate over metadata-scale
      // DWS state — generous 2 s bound absorbs CI jitter while still
      // catching an accidental corpus-shaped plan on the serve path
      assert(perLookupMs < 2000.0, s"warm gmv lookup took $perLookupMs ms")
    } finally serve.uncache()
  }
}
