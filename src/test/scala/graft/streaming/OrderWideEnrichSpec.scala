package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OrderWideEnrichSpec extends SparkSpec {

  test("J3/J4: 6-dim enrichment with derived age, chained sku FKs, and lookup misses") {
    val s = spark
    import s.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dims").toString
    def writeDim(t: String, rows: Seq[(String, Map[String, String])]): Unit =
      rows.toDF("pk", "data").write.parquet(s"$dimDir/$t")

    writeDim("dim_user_info", Seq(
      "7" -> Map("birthday" -> "1990-01-01", "gender" -> "F")))
    writeDim("dim_base_province", Seq(
      "3" -> Map("name" -> "Shandong", "area_code" -> "370000",
        "iso_code" -> "CN-37", "iso_3166_2" -> "CN-SD")))
    writeDim("dim_sku_info", Seq(
      "10" -> Map("sku_name" -> "phone x", "spu_id" -> "100",
        "category3_id" -> "61", "tm_id" -> "5")))
    writeDim("dim_spu_info", Seq("100" -> Map("spu_name" -> "phone")))
    writeDim("dim_base_category3", Seq("61" -> Map("name" -> "mobiles")))
    // dim_base_trademark intentionally absent: auto-DDL not yet fired

    val batch = Seq(
      // orderId, userId, provinceId, totalAmount, o_time, detailId, skuId, splitAmount, d_time
      (1L, 7L, 3L, 55.0, ts(1591000000000L), 11L, 10L, 55.0, ts(1591000000005L)),
      (2L, 99L, 9L, 20.0, ts(1591000000000L), 12L, 44L, 20.0, ts(1591000000005L)))
      .toDF("orderId", "userId", "provinceId", "totalAmount", "o_time",
        "detailId", "skuId", "splitAmount", "d_time")

    val out = OrderWideEnrich.enrich(batch, s, dimDir).collect()
      .map(r => r.getAs[Long]("orderId") -> r).toMap

    val r1 = out(1L)
    // 1990-01-01 -> 2020-06-01: 30.4 ms-years, floored like the reference
    assert(r1.getAs[Long]("user_age") === 30L)
    assert(r1.getAs[String]("user_gender") === "F")
    assert(r1.getAs[String]("province_name") === "Shandong")
    assert(r1.getAs[String]("province_3166_2_code") === "CN-SD")
    assert(r1.getAs[String]("sku_name") === "phone x")
    assert(r1.getAs[String]("spu_name") === "phone")       // chained via sku.spu_id
    assert(r1.getAs[String]("category3_name") === "mobiles")
    assert(r1.getAs[String]("tm_name") === null)           // dim absent -> miss

    val r2 = out(2L) // no dim hits at all: enrichment is left-join-safe
    assert(r2.getAs[Any]("user_age") === null)
    assert(r2.getAs[String]("sku_name") === null)
    assert(r2.getAs[Double]("splitAmount") === 20.0)
  }

  test("malformed dim values degrade to lookup misses, not batch failure") {
    val s = spark
    import s.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dims-bad").toString
    // junk pk (non-numeric) and junk birthday: under ANSI mode a plain
    // CAST would throw and kill the micro-batch
    Seq(
      ("not-a-number", Map("birthday" -> "1990-01-01", "gender" -> "M")),
      ("7", Map("birthday" -> "never", "gender" -> "F")))
      .toDF("pk", "data").write.parquet(s"$dimDir/dim_user_info")
    val batch = Seq(
      (1L, 7L, 3L, 55.0, ts(1591000000000L), 11L, 10L, 55.0, ts(1591000000005L)))
      .toDF("orderId", "userId", "provinceId", "totalAmount", "o_time",
        "detailId", "skuId", "splitAmount", "d_time")
    val out = OrderWideEnrich.enrich(batch, s, dimDir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("user_gender") === "F") // pk 7 still matched
    assert(r.getAs[Any]("user_age") === null)      // junk birthday -> null age
  }

  test("ProductStats dim enrichment: sku chain joins onto aggregated stats") {
    val s = spark
    import s.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dims-ps").toString
    def writeDim(t: String, rows: Seq[(String, Map[String, String])]): Unit =
      rows.toDF("pk", "data").write.parquet(s"$dimDir/$t")
    writeDim("dim_sku_info", Seq(
      "10" -> Map("sku_name" -> "phone x", "sku_price" -> "4999.00",
        "spu_id" -> "100", "category3_id" -> "61", "tm_id" -> "5")))
    writeDim("dim_spu_info", Seq("100" -> Map("spu_name" -> "phone")))
    writeDim("dim_base_category3", Seq("61" -> Map("name" -> "mobiles")))
    writeDim("dim_base_trademark", Seq("5" -> Map("tm_name" -> "acme")))

    val stats = Seq(("10", 3L, 95.0), ("77", 1L, 10.0))
      .toDF("sku_id", "click_ct", "order_amount")
    val out = OrderWideEnrich.productStatsEnrich(stats, s, dimDir).collect()
      .map(r => r.getAs[String]("sku_id") -> r).toMap
    val r10 = out("10")
    assert(r10.getAs[String]("sku_name") === "phone x")
    assert(r10.getAs[String]("sku_price") === "4999.00")
    assert(r10.getAs[String]("spu_name") === "phone")
    assert(r10.getAs[String]("category3_name") === "mobiles")
    assert(r10.getAs[String]("tm_name") === "acme")
    assert(r10.getAs[Long]("click_ct") === 3L) // metrics untouched
    assert(out("77").getAs[String]("sku_name") === null) // miss-safe
  }
}
