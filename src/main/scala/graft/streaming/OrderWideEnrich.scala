package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** J3/J4 — the reference's full 6-dimension OrderWide enrichment
  * (OrderWideApp.java:155-281): user (with derived age + gender), province,
  * sku, spu, category3, trademark. Dim inputs are the (pk, data map)
  * parquet snapshots [[DynamicRouting.upsertDims]] maintains; sku carries
  * the spu/category3/trademark foreign keys, so those three chain off the
  * sku join exactly like the reference's lookup order.
  *
  * Spark-first: six broadcast left joins against per-batch dim snapshots
  * replace the reference's chained async lookups + Redis cache
  * (DimAsyncFunction.java:26-79); the dims stay broadcast-sized (they are
  * Phoenix point-lookup tables in the reference) and the fact stream never
  * shuffles for enrichment — the shape that survives 100 TB.
  *
  * J4 determinism: the reference derives age from System.currentTimeMillis
  * (OrderWideApp.java:176-186) — wall-clock-dependent and unreplayable.
  * Here age uses the order's event time with the same millisecond
  * arithmetic (ms / 1000/60/60/24/365, floored), which is reproducible.
  */
object OrderWideEnrich {

  /** Reference age divisor: 1000 ms × 60 s × 60 min × 24 h × 365 d. */
  val MsPerYear: Long = 365L * 24 * 60 * 60 * 1000

  /** A dim snapshot, or an empty (pk, data) frame when the table has not
    * been auto-DDL'd yet (X4 create-on-first-write) — a missing dim then
    * enriches to nulls, like a reference lookup miss. */
  private def dimOrEmpty(spark: SparkSession, dimDir: String, t: String): DataFrame = {
    val path = s"$dimDir/$t"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL("pk STRING, data MAP<STRING,STRING>"))
  }

  /** The SKU dim chain shared by OrderWide and ProductStats enrichment:
    * sku -> (sku_name, sku_price, spu_id, category3_id, tm_id), then
    * spu_name / category3_name / tm_name through the foreign keys the sku
    * row carries (OrderWideApp.java:218-281, ProductStatsApp.java:316-397).
    * `skuKey` must already be a string (dim pks are strings). */
  def skuChain(df: DataFrame, spark: SparkSession, dimDir: String,
               skuKey: Column): DataFrame = {
    def d(t: String) = dimOrEmpty(spark, dimDir, t)
    val sku = d("dim_sku_info").select(col("pk").as("sk_pk"),
      element_at(col("data"), "sku_name").as("sku_name"),
      element_at(col("data"), "sku_price").as("sku_price"),
      element_at(col("data"), "spu_id").as("spu_id"),
      element_at(col("data"), "category3_id").as("category3_id"),
      element_at(col("data"), "tm_id").as("tm_id"))
    val spu = d("dim_spu_info").select(col("pk").as("sp_pk"),
      element_at(col("data"), "spu_name").as("spu_name"))
    val cat3 = d("dim_base_category3").select(col("pk").as("c3_pk"),
      element_at(col("data"), "name").as("category3_name"))
    val tm = d("dim_base_trademark").select(col("pk").as("tm_pk"),
      element_at(col("data"), "tm_name").as("tm_name"))
    df.join(broadcast(sku), skuKey === col("sk_pk"), "left")
      .join(broadcast(spu), col("spu_id") === col("sp_pk"), "left")
      .join(broadcast(cat3), col("category3_id") === col("c3_pk"), "left")
      .join(broadcast(tm), col("tm_id") === col("tm_pk"), "left")
      .drop("sk_pk", "sp_pk", "c3_pk", "tm_pk")
  }

  /** Enrich an order-wide batch (orderId/userId/provinceId/skuId/.../o_time
    * — the [[IntervalJoins.orderWide]] output shape) with all six dims. */
  def enrich(batch: DataFrame, spark: SparkSession, dimDir: String): DataFrame = {
    def d(t: String) = dimOrEmpty(spark, dimDir, t)
    val user = d("dim_user_info").select(col("pk").as("u_pk"),
      element_at(col("data"), "birthday").as("birthday"),
      element_at(col("data"), "gender").as("user_gender"))
    val prov = d("dim_base_province").select(col("pk").as("pr_pk"),
      element_at(col("data"), "name").as("province_name"),
      element_at(col("data"), "area_code").as("province_area_code"),
      element_at(col("data"), "iso_code").as("province_iso_code"),
      element_at(col("data"), "iso_3166_2").as("province_3166_2_code"))
    val base = batch
      // try_cast everywhere a dim value feeds an expression: dim rows are
      // schema-on-read CDC maps, and under ANSI mode a single malformed pk
      // or birthday would otherwise kill the whole micro-batch — a lookup
      // miss (null) is the correct degradation, like the reference's
      // failed async lookup
      .join(broadcast(user),
        col("userId") === expr("try_cast(u_pk AS LONG)"), "left")
      .withColumn("user_age",
        expr(s"(unix_millis(o_time) - unix_millis(try_cast(birthday AS TIMESTAMP))) div $MsPerYear"))
      .join(broadcast(prov),
        col("provinceId") === expr("try_cast(pr_pk AS LONG)"), "left")
    skuChain(base, spark, dimDir, col("skuId").cast("string"))
      .drop("u_pk", "pr_pk", "birthday")
  }

  /** ProductStats dim enrichment (ProductStatsApp.java:316-397): the sku
    * chain joined onto the aggregated stats keyed by sku_id. */
  def productStatsEnrich(stats: DataFrame, spark: SparkSession,
                         dimDir: String): DataFrame =
    skuChain(stats, spark, dimDir, col("sku_id"))
}
