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
    // TIMESTAMP(MICROS) NTZ whose wall-clock MEANS UTC, so normalize at the
    // load boundary with pure wall-clock arithmetic (timestampdiff over NTZ
    // values never consults spark.sql.session.timeZone — a non-UTC caller
    // session cannot shift the result; a session-tz CAST here could).
    // Nanos-generation data (ts already a Long via the legacy conf) passes
    // through untouched. The derived column does cost parquet range
    // pushdown on ts — accepted: no declared query filters events.ts by a
    // constant range (they window/aggregate over the full stream); a query
    // that needs one should filter the native column pre-conversion.
    import org.apache.spark.sql.types.{LongType, TimestampType}
    if (name == "events" && df.schema("ts").dataType != LongType) {
      val toNs =
        if (df.schema("ts").dataType == TimestampType)
          // instant-typed: unix_micros is tz-independent already
          "unix_micros(ts) * 1000L"
        else
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000L"
      df.withColumn("ts", org.apache.spark.sql.functions.expr(toNs))
    } else df
  }

  /** Register every table as a temp view (used by the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
