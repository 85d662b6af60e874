package graft.streaming

import graft.SparkSpec
import graft.sources.Kafka
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** K2-EO: the batchId-transaction ledger that stands in for the
  * reference's EXACTLY_ONCE transactional producer
  * (MyKafkaUtil.java:38-45). Proves the two replay-safety halves over
  * the same routed LogPipeline/CDC shape the K2 wrapper ships:
  * a REDELIVERED batchId produces no duplicate sink effect, and an
  * UNCOMMITTED half-written segment is invisible to a read_committed
  * consumer until the replay commits it. */
class KafkaExactlyOnceSpec extends SparkSpec {

  private def routedBatch(rows: Seq[(String, String, Long, Map[String, String])]) = {
    val s = spark
    import s.implicits._
    val config = Seq(
      ("order_info", "insert", "kafka", "dwd_order_info",
        "id,user_id,total_amount", "id"),
      ("payment_info", "insert", "kafka", "dwd_payment_info",
        "id,order_id", "id"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable",
        "sinkColumns", "sinkPk")
    DynamicRouting.factRecords(DynamicRouting.routed(
      rows.toDF("table", "type", "ts", "data"), config))
  }

  test("redelivered batchId is a no-op: no duplicate produce, ledger skip") {
    val broker = java.nio.file.Files.createTempDirectory("graft-eo").toString
    val b0 = routedBatch(Seq(
      ("order_info", "insert", 1L, Map("id" -> "1", "user_id" -> "7",
        "total_amount" -> "5.00")),
      ("payment_info", "insert", 2L, Map("id" -> "p1", "order_id" -> "1"))))
    assert(Kafka.txnProduce(b0, broker, 0L), "first delivery must produce")
    val first = Kafka.readCommitted(spark, broker)
      .orderBy(col("topic"), col("value")).collect()
    assert(first.length === 2)
    // crash-replay: Structured Streaming re-runs the SAME batchId
    assert(!Kafka.txnProduce(b0, broker, 0L), "replay must be skipped")
    assert(!Kafka.txnProduce(b0.limit(1), broker, 0L),
      "even a differently-shaped replay of a committed id is skipped")
    val after = Kafka.readCommitted(spark, broker)
      .orderBy(col("topic"), col("value")).collect()
    assert(after.toSeq === first.toSeq, "sink effect must be unchanged")
    // a FRESH batchId still goes through
    val b1 = routedBatch(Seq(("order_info", "insert", 3L,
      Map("id" -> "2", "user_id" -> "8", "total_amount" -> "1.50"))))
    assert(Kafka.txnProduce(b1, broker, 1L))
    assert(Kafka.readCommitted(spark, broker).count() === 3)
    // per-topic routing is preserved through the partitioned segment
    val topics = Kafka.readCommitted(spark, broker)
      .groupBy(col("topic")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(topics === Map("dwd_order_info" -> 2L, "dwd_payment_info" -> 1L))
  }

  test("uncommitted half-written segment is invisible; replay commits it") {
    val broker = java.nio.file.Files.createTempDirectory("graft-eo2").toString
    val b0 = routedBatch(Seq(("order_info", "insert", 1L,
      Map("id" -> "1", "user_id" -> "7", "total_amount" -> "5.00"))))
    assert(Kafka.txnProduce(b0, broker, 0L))
    // simulate a crash mid-produce of batch 1: segment dir without the
    // _SUCCESS transaction marker
    val b1 = routedBatch(Seq(("order_info", "insert", 2L,
      Map("id" -> "9", "user_id" -> "9", "total_amount" -> "9.99"))))
    Kafka.txnProduce(b1, broker, 1L)
    val marker = java.nio.file.Paths.get(broker, "v=1", "_SUCCESS")
    java.nio.file.Files.delete(marker)
    assert(Kafka.readCommitted(spark, broker).count() === 1,
      "read_committed must not see the aborted segment")
    // the replay overwrites the torn segment and commits it exactly once
    assert(Kafka.txnProduce(b1, broker, 1L), "replay of an uncommitted id runs")
    assert(Kafka.readCommitted(spark, broker).count() === 2)
    assert(Kafka.readCommitted(spark, broker)
      .filter(col("batch_id") === 1L).count() === 1)
  }

  test("end-to-end: streaming foreachBatch sink is replay-safe over CDC events") {
    val s = spark
    import s.implicits._
    val broker = java.nio.file.Files.createTempDirectory("graft-eo3").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-eo3-ckpt").toString
    val config = Seq(("order_info", "insert", "kafka", "dwd_order_info",
      "id,user_id,total_amount", "id"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable",
        "sinkColumns", "sinkPk")
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(String, String, Long, Map[String, String])]
    mem.addData(
      ("order_info", "insert", 1L, Map("id" -> "1", "user_id" -> "5",
        "total_amount" -> "9.90")),
      ("order_info", "insert", 2L, Map("id" -> "2", "user_id" -> "6",
        "total_amount" -> "4.20")))
    val routed = DynamicRouting.factRecords(DynamicRouting.routed(
      mem.toDF().toDF("table", "type", "ts", "data"), config))
    val q = Kafka.exactlyOnceDynamicTopicSink(routed, broker, ckpt).start()
    q.processAllAvailable(); q.stop()
    val produced = Kafka.readCommitted(spark, broker)
      .orderBy(col("value")).collect()
    assert(produced.length === 2)
    // re-deliver the already-committed batch 0 directly (the crash-replay
    // path foreachBatch takes): zero duplicate effect
    val staticRouted = routedBatch(Seq(("order_info", "insert", 1L,
      Map("id" -> "1", "user_id" -> "5", "total_amount" -> "9.90"))))
    assert(!Kafka.txnProduce(staticRouted, broker, 0L))
    assert(Kafka.readCommitted(spark, broker).count() === 2)
  }
}
