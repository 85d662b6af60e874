package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proof of the bucketing scale path: two tables bucketed on the same key
  * join and aggregate with NO shuffle exchange in the physical plan — the
  * write-once/join-free-forever layout for repeated fact⋈fact joins.
  */
class BucketedJoinSpec extends SparkSpec {

  test("equi-join of co-bucketed tables plans without a shuffle exchange") {
    val s = spark
    // bucketed joins need the bucketing respected and enough info to avoid
    // AQE re-planning surprises in the assertion
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.Tables.load(s, sf, "orders")
      val lineitem = graft.Tables.load(s, sf, "lineitem")
      Warehouse.writeBucketed(orders, "b_orders", Seq("o_orderkey"), buckets = 8)
      Warehouse.writeBucketed(lineitem, "b_lineitem", Seq("l_orderkey"), buckets = 8)
      // join + aggregate BOTH on the bucket key: the whole plan needs no
      // exchange — bucketing carries HashPartitioning through join and agg
      val joined = s.table("b_lineitem")
        .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("ct"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the same answer as the plain-parquet join
      val viaBucket = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaPlain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("ct"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaBucket === viaPlain)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
