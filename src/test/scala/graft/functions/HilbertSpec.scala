package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q137 Hilbert curve: transform correctness (bijection; equals the
  * driver-side reference loop; unit-step adjacency — the property Morton
  * lacks) and the fragmentation claim the audit reports. */
class HilbertSpec extends SparkSpec {

  test("hilbert index is a bijection matching the reference loop (32x32)") {
    import spark.implicits._
    // full 32x32 subgrid (low coords — exercises all rotation branches)
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
    val df = Hilbert.withHilbert(grid.toDF("cx", "cy"), "cx", "cy")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(df((x, y)) == Hilbert.xy2dLocal(x, y), s"($x,$y)")
    }
    assert(df.values.toSet.size == grid.size, "not a bijection")
  }

  test("consecutive hilbert indices are grid-adjacent (unit steps)") {
    // the defining locality property: |Δx| + |Δy| == 1 between d and d+1.
    // Morton violates this at every quadrant seam (jumps up to N/2).
    val full = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
    val byD = full.map { case (x, y) => Hilbert.xy2dLocal(x, y) -> (x, y) }
      .toMap
    (0L until (64L * 64L - 1)).foreach { d =>
      // restrict to the 64x64 subcurve: consecutive d inside it
      (byD.get(d), byD.get(d + 1)) match {
        case (Some((x1, y1)), Some((x2, y2))) =>
          assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
        case _ => () // d or d+1 leaves the subgrid — not a unit-step claim
      }
    }
  }

  test("writeHilbertOrdered round-trips rows and tightens per-file spans") {
    val dir = java.nio.file.Files.createTempDirectory("hilb").toString + "/t"
    val li = graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    graft.sinks.Warehouse.writeHilbertOrdered(li, dir, "l_partkey",
      "l_suppkey", files = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.columns.sorted.sameElements(li.columns.sorted))
    // clustered layout: average per-file partkey span well under the
    // full domain (a random layout's span ≈ the domain in every file)
    val spans = back.withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg((max(col("l_partkey")) - min(col("l_partkey"))).as("span"))
      .collect().map(_.getLong(1))
    val domain = li.agg(max(col("l_partkey")) - min(col("l_partkey")))
      .collect()(0).getLong(0)
    assert(spans.sum / spans.length < domain / 2,
      s"files not clustered: avg span ${spans.sum / spans.length} of $domain")
  }

  test("hilbert fragments the box into fewer scan ranges than morton") {
    val rows = Hilbert.curveRunsAudit(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("hilbert")._1 == rows("morton")._1, "cell sets must match")
    assert(rows("hilbert")._2 < rows("morton")._2,
      s"hilbert ${rows("hilbert")._2} runs vs morton ${rows("morton")._2}")
  }
}
