package graft

/** Load-boundary contract for the driver parquet tables (ADVICE r7):
  * events.ts must normalize to the same epoch-nanos Longs no matter what
  * spark.sql.session.timeZone the calling session runs under — the NTZ
  * wall-clock means UTC by data contract, and the conversion must not
  * consult the session zone.
  */
class TablesSpec extends SparkSpec {

  test("events.ts normalization is session-timezone independent") {
    val utc = Tables.load(spark, sf, "events")
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(utc.nonEmpty)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
      val shifted = Tables.load(spark, sf, "events")
        .select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(shifted === utc,
        "ts drifted under a non-UTC session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("events.ts is epoch nanoseconds in a plausible range") {
    val row = Tables.load(spark, sf, "events")
      .agg(org.apache.spark.sql.functions.min("ts"),
        org.apache.spark.sql.functions.max("ts")).head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    // 2001-09-09 and 2033-05-18 in epoch ns — any µs- or s-scale slip
    // (or a zone shift applied twice) lands far outside
    assert(lo > 1000000000000000000L && hi < 2000000000000000000L)
  }
}
