package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** q135 bloom semi-join reduction: no false negatives (the filter's
  * defining guarantee), the audit's internal consistency, and the MEASURED
  * shuffle-row reduction that is the operator's reason to exist. */
class BloomSpec extends SparkSpec {

  test("no false negatives and the audit cross-foots (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val r = Bloom.bloomJoinAudit(spark, dir).collect()(0)
    val (probe, passed, tm, fp, fpPpm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // ground truth: lineitem rows whose order IS urgent
    val truth = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(tm == truth, s"bloom dropped true matches: $tm vs $truth")
    assert(passed == tm + fp)
    assert(probe == Tables.load(spark, dir, "lineitem").count())
    assert(fpPpm == fp * 1000000L / (probe - tm))
    // the filter must be selective enough to be worth shipping
    assert(passed * 2 < probe, s"filter not selective: $passed of $probe")
    assert(fpPpm < 10000, s"fp rate out of design envelope: $fpPpm ppm")
  }

  test("bloom prefilter cuts the probe side's shuffle records") {
    val dir = "/root/testdata/sf0.01"
    def shuffledRecords(mk: => DataFrame): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = mk
        df.collect()
        df.queryExecution.executedPlan.collect {
          case s: ShuffleExchangeExec =>
            s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
        }.sum
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    val build = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k")).distinct()
    val probe = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    def agg(joined: DataFrame): DataFrame =
      joined.agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    // plain shuffle join: every probe row crosses the exchange
    val plain = shuffledRecords(agg(probe.join(build, "k")))
    // bloom-prefiltered: only passing rows reach the exchange
    val bloom = Bloom.buildFilter(build, "k")
    val pre = Bloom.prefilter(probe, "k", bloom).join(build, "k")
    val pruned = shuffledRecords(agg(pre))
    assert(pruned * 2 < plain,
      s"bloom prefilter did not cut shuffle records: $pruned vs $plain")
    info(s"shuffle records: plain=$plain bloom-pruned=$pruned")
  }
}
