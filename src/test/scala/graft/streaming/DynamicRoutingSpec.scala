package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DynamicRoutingSpec extends SparkSpec {

  test("X2/P4/K2/K3: config-driven routing, pruning, dim upsert") {
    val s = spark
    import s.implicits._
    val config = Seq(
      ("order_info", "insert", "kafka", "dwd_order_info", "id,user_id,total_amount", "id"),
      ("base_trademark", "insert", "dim", "dim_base_trademark", "id,tm_name", "id"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns", "sinkPk")

    val cdc = Seq(
      ("order_info", "insert", 1L, Map("id" -> "1", "user_id" -> "5",
        "total_amount" -> "9.90", "secret" -> "drop_me")),
      ("base_trademark", "bootstrap-insert", 2L, Map("id" -> "10", "tm_name" -> "Apple", "junk" -> "x")),
      ("base_trademark", "insert", 3L, Map("id" -> "10", "tm_name" -> "Apple Inc")),
      ("unconfigured", "insert", 4L, Map("id" -> "9", "a" -> "b", "c" -> "d")))
      .toDF("table", "type", "ts", "data")

    val routedDf = DynamicRouting.routed(cdc, config)
    assert(routedDf.count() === 3) // unconfigured table dropped (X2 routing)

    // P4: column pruning by config whitelist
    val fact = routedDf.filter(col("sinkType") === "kafka").head()
    val keys = fact.getAs[Map[String, String]]("data").keySet
    assert(keys === Set("id", "user_id", "total_amount"))

    // K2: per-row topic column shape
    val facts = DynamicRouting.factRecords(routedDf).collect()
    assert(facts.length === 1 && facts.head.getAs[String]("topic") === "dwd_order_info")

    // K3: last-write-wins upsert by pk
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dims").toString
    DynamicRouting.upsertDims(routedDf, dimDir)
    val dim = s.read.parquet(s"$dimDir/dim_base_trademark")
    assert(dim.count() === 1)
    assert(dim.head().getAs[Map[String, String]]("data")("tm_name") === "Apple Inc")
  }
}
