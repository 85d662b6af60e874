package graft.functions

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** MEASURED file-skipping proof for the z-order layout (q94's claim).
  *
  * ZOrderSpec argues from simulated chunk min/max spans; this spec runs
  * the real thing end-to-end: write lineitem to parquet under (a) a
  * z-ordered layout and (b) a partkey-sorted layout, run the same
  * selective second-dimension filter over both, and read the executed
  * scan's `numOutputRows` SQLMetric — rows the parquet reader actually
  * produced after row-group/page skipping against footer stats. At 100 TB
  * this number IS the scan cost: a layout that cannot skip reads the
  * whole table for every selective filter.
  */
class ZOrderPruningSpec extends SparkSpec {

  /** Rows the parquet scan produced (post row-group pruning, pre any
    * residual Spark-side Filter). AQE off so the executed plan carries
    * the scan node directly. */
  private def scannedRows(df: DataFrame): Long = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("z-ordered files skip most row groups on a second-dimension filter") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val n = 64

    // (a) z-ordered via the K4 sink path: range-partition + sort by the
    // interleaved key, so every file's footer min/max is tight in BOTH
    // dimensions
    val zDir = Files.createTempDirectory("graft-zlay").toString + "/t"
    graft.sinks.Warehouse.writeZOrdered(li, zDir,
      "l_partkey", "l_suppkey", files = n)

    // (b) single-column sort: partkey clustered, suppkey scrambled within
    // (hash tiebreak models arrival order — sorting by suppkey itself
    // would smuggle in the locality this layout is supposed to lack)
    val linDir = Files.createTempDirectory("graft-linlay").toString
    li.repartitionByRange(n, col("l_partkey"), xxhash64(col("l_suppkey")))
      .sortWithinPartitions(col("l_partkey"), xxhash64(col("l_suppkey")))
      .write.mode("overwrite").parquet(linDir)

    val total = li.count()
    val oneSupp = col("l_suppkey") === 3
    val zScan = spark.read.parquet(zDir).filter(oneSupp)
    val zRead = scannedRows(zScan)
    val linRead = scannedRows(spark.read.parquet(linDir).filter(oneSupp))

    // the filter must actually reach the parquet reader
    assert(zScan.queryExecution.executedPlan.toString
        .contains("PushedFilters: [IsNotNull(l_suppkey), EqualTo(l_suppkey,3)]"),
      "suppkey filter not pushed to the scan")
    // partkey-sorted layout cannot skip: every file spans all suppliers
    assert(linRead > total / 2,
      s"linear layout unexpectedly pruned: $linRead of $total")
    // z-order skips most files: ~1/8 of rows at a 64-file 8x8 grid
    assert(zRead * 3 < linRead,
      s"z-order layout did not prune: read $zRead vs linear $linRead of $total")
    info(f"scan rows for suppkey=3: z-order $zRead%,d vs linear $linRead%,d of $total%,d (${linRead.toDouble / zRead}%.1fx fewer)")

    // both layouts return the identical result — layout is invisible to
    // correctness, only to cost
    val zRows = spark.read.parquet(zDir).filter(oneSupp).count()
    val linRows = spark.read.parquet(linDir).filter(oneSupp).count()
    assert(zRows === linRows && zRows > 0)
  }
}
