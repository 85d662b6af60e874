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
}
