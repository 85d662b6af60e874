package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scale note: each table is a plain parquet directory/file; at 100 TB the
  * same loader works unchanged because all downstream operators are built on
  * the declarative DataFrame API (Catalyst pushes filters/column pruning into
  * the scan; see `.explain` checks in the specs). Nothing here collects to
  * the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Earlier driver data stored events.ts as TIMESTAMP(NANOS), which Spark
    // only reads (as a nanosecond Long) via this legacy conf — keep it set
    // defensively so either generation of the testdata loads.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Engine-wide contract: events.ts is a BIGINT of epoch NANOseconds
    // (every downstream operator and every DuckDB oracle — epoch_ns(ts) —
    // computes in that domain). Current driver data stores ts as
    // TIMESTAMP(MICROS)/NTZ, so normalize at the load boundary: under the
    // pinned-UTC session the NTZ→TZ cast is the identity, and µs×1000 is
    // exactly DuckDB's epoch_ns of the same instant. Nanos-generation data
    // (ts already a Long via the legacy conf) passes through untouched.
    if (name == "events" &&
        df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
    else df
  }

  /** Register every table as a temp view (used by the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
