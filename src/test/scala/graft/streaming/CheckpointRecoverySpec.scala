package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Fault-tolerance semantics (SURVEY.md §4 exactly-once discussion): a
  * stopped query restarted from its checkpoint resumes at the committed
  * offsets — already-processed input is not reprocessed, so an idempotent
  * or append-only sink sees each record exactly once. This is the Spark
  * contract replacing the reference's Kafka EXACTLY_ONCE transactional
  * producer (MyKafkaUtil.java:44).
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("restart from checkpoint does not reprocess committed batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ck-rec").toString
    val out = java.nio.file.Files.createTempDirectory("out-rec").toString + "/t"
    val in = MemoryStream[(Long, String)]

    def start() = in.toDF().toDF("id", "payload")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .start()

    in.addData((1L, "a"), (2L, "b"))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(s.read.parquet(out).count() === 2)

    in.addData((3L, "c"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val rows = s.read.parquet(out).select(col("id")).as[Long].collect().sorted
    assert(rows === Array(1L, 2L, 3L), s"expected no reprocessing, got ${rows.mkString(",")}")
  }
}
