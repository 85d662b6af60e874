package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** K4-class warehouse writers (the reference's ClickHouse JDBC sink,
  * ClickHouseUtil.java:27-78, becomes partitioned columnar tables).
  *
  * 100 TB layout rules encoded here:
  *  - partition by day so serving queries (GMV by date — A7) prune to one
  *    partition instead of scanning the store;
  *  - drop "transient" columns before write (the reference's
  *    @TransientSink marker, bean/TransientSink.java) — a projection;
  *  - coalesce small streaming micro-batches so the store does not
  *    accumulate thousands of tiny files (the small-files problem).
  */
object Warehouse {

  /** Append a DWS frame partitioned by its window-start day. */
  def writeDws(df: DataFrame, path: String,
               transientCols: Seq[String] = Nil,
               filesPerBatch: Int = 4): Unit =
    df.drop(transientCols: _*)
      .withColumn("dt", substring(col("stt"), 1, 10))
      .coalesce(filesPerBatch)
      .write.mode(SaveMode.Append)
      .partitionBy("dt")
      .parquet(path)

  /** Serving-side read with partition pruning by day. */
  def readDay(spark: org.apache.spark.sql.SparkSession, path: String,
              day: String): DataFrame =
    spark.read.parquet(path).filter(col("dt") === day)
}
