package graft

/** Guards on the driver contract itself: the correctness gate silently
  * downgrades any query without an oracle to a rows-only check, so drift
  * between the two maps is a coverage regression — fail it in CI instead.
  */
class ContractSpec extends SparkSpec {

  test("every declared query has a DuckDB oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q === o, s"missing oracles: ${q -- o}; orphan oracles: ${o -- q}")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs against sf0.001 and returns a stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name produced no columns")
      assert(df.columns.distinct.length === df.columns.length,
        s"$name has duplicate column names: ${df.columns.mkString(",")}")
    }
  }
}
