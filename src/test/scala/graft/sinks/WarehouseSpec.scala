package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("partitioned DWS write: day pruning, transient drop, bounded files") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("2021-02-19 00:00:00", "2021-02-19 00:00:10", 5.0, "internal"),
      ("2021-02-20 00:00:00", "2021-02-20 00:00:10", 7.0, "internal"))
      .toDF("stt", "edt", "order_amount", "scratch")
    val path = java.nio.file.Files.createTempDirectory("dws").toString + "/t"
    Warehouse.writeDws(df, path, transientCols = Seq("scratch"))
    val day = Warehouse.readDay(s, path, "2021-02-19")
    assert(day.count() === 1)
    assert(!day.columns.contains("scratch"))
    // partition pruning visible in the scan
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("dt"), plan)
  }

  test("typed exact-distinct Aggregator matches countDistinct") {
    val s = spark
    import s.implicits._
    val events = graft.Tables.load(s, sf, "events")
      .select(col("user_id")).as[Long]
    val viaAgg = events.select(graft.functions.DistinctCount.toColumn).head()
    val viaBuiltin = graft.Tables.load(s, sf, "events")
      .agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(viaAgg === viaBuiltin)
  }

  test("HRW-sharded write: shard dirs prune, assignment stable on append") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("hrw").toString
    graft.sinks.Warehouse.writeHrwSharded(docs, dir, shards = 8)
    val back = spark.read.parquet(dir)
    // directory-level pruning: a shard predicate reads only its dir
    val one = back.filter(col("shard") === 3)
    val scanned = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    assert(back.count() === docs.count())
    // assignment is a pure function of doc_id: re-deriving the shard for
    // every row matches the directory each row landed in
    val rederived = graft.operators.Layout
      .shardOf(back.select(col("doc_id"), col("n_chars")), 8)
      .withColumnRenamed("shard", "shard2")
    val mismatches = back.join(rederived, "doc_id")
      .filter(col("shard") =!= col("shard2")).count()
    assert(mismatches === 0L, "shard not re-derivable from content")
    assert(scanned.contains("shard"), s"partition column lost:\n$scanned")
  }
}
