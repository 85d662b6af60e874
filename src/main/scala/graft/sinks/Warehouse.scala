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

  /** Bucketed catalog table: hash-co-locates (and sorts) rows by the join
    * key at WRITE time, so every downstream equi-join or aggregation on
    * that key between same-bucketing tables runs with NO exchange — the
    * planner proves both sides share HashPartitioning(buckets). This is
    * the 100 TB answer to repeated fact⋈fact joins (e.g. orders⋈lineitem
    * every night): pay the shuffle once at ingest, never again.
    * BucketedJoinSpec asserts the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
