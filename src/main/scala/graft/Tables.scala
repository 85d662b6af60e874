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
    // events.parquet stores TIMESTAMP(NANOS), which Spark only reads as a
    // nanosecond Long via this legacy conf — set defensively so any session
    // (not just Verify/Bench) can load every table
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (used by the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
