package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q191 label-outlier review queue: per-label structure on the corpus and
  * a planted mislabeled vector that must surface at rank 1. */
class LabelOutliersSpec extends SparkSpec {

  test("q191: k rows per label, ranks contiguous, csim ascending") {
    val rows = Similarity.labelOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3).toLong))
    assert(rows.nonEmpty)
    val labelCt = graft.Tables.load(spark, sf, "embeddings")
      .groupBy(col("label").cast("long").as("l")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (l, rs) =>
      assert(rs.length === math.min(5L, labelCt(l)), s"label $l row count")
      assert(rs.map(_._4).sorted.toSeq === (1L to rs.length))
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        s"label $l csim not ascending with rank")
    }
  }

  test("q191: planted mislabel lands at rank 1 of its claimed label") {
    // label 0 mass along e1, label 1 mass along e2; vec 99 claims label 0
    // but points along e2 — the exact review-queue case
    val rows: Seq[(Long, Array[Float], Int)] =
      (0L to 9L).map(i => (i, Array.tabulate(64)(d =>
        if (d == 0) 10f else if (d.toLong == i % 3 + 1) 1f else 0f), 0)) ++
      (10L to 19L).map(i => (i, Array.tabulate(64)(d =>
        if (d == 1) 10f else if (d.toLong == i % 3 + 2) 1f else 0f), 1)) :+
      ((99L, Array.tabulate(64)(d => if (d == 1) 10f else 0f), 0))
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("q191").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.labelOutliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3).toLong))
    val top = out.filter(t => t._1 == 0L && t._3 == 1L)
    assert(top.length === 1 && top.head._2 === 99L,
      "mislabeled vector must head label 0's review queue")
  }
}
