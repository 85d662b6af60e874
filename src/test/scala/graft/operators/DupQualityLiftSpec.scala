package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q192 dup×quality contingency: marginal identities on the corpus. */
class DupQualityLiftSpec extends SparkSpec {

  test("q192: cells cover the scored population, lifts respect marginals") {
    val rows = Dedup.dupQualityLift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSet.subsetOf(Set("head", "middle", "tail")))
    assert(rows.map(_._2).toSet.subsetOf(Set(0L, 1L)))
    // cell mass = q188's scored population (docs with >= 2 tokens)
    val scored = graft.Tables.load(spark, sf, "documents")
      .select(size(graft.functions.Text.tokens(col("text"))).as("n"))
      .filter(col("n") >= 2).count()
    assert(rows.map(_._3).sum === scored)
    // terciles: bucket row-totals differ by at most 1
    val rowTot = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(rowTot.values.max - rowTot.values.min <= 1)
    // lift marginal identity: within each bucket the doc-weighted mean
    // lift is ~1e6 (integer-div slack bounded by the cell count)
    val colTot = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = rows.map(_._3).sum
    rows.foreach { case (b, d, n, lift) =>
      val exact = n.toDouble * total / (rowTot(b).toDouble * colTot(d))
      assert(math.abs(lift / 1e6 - exact) < 0.01,
        s"cell ($b,$d) lift drifted from the exact ratio")
    }
  }
}
