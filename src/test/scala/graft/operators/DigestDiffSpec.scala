package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

/** q138 bucket-digest anti-entropy diff: the drilled result equals the
  * full key-by-key diff, the digest stage actually prunes, and identical
  * snapshots produce zero dirty buckets. */
class DigestDiffSpec extends SparkSpec {

  private val B = 1024

  private def snapshots = {
    val d = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"), expr("doc_id % 100").as("m"))
    val prev = d.filter(col("m") =!= 99)
      .select(col("doc_id"), PortableHash.h60(col("text")).as("h"))
    val next = d.filter(col("m") =!= 0)
      .select(col("doc_id"), PortableHash.h60(
        when(col("m") === 42, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("h"))
    (prev, next)
  }

  test("drilled diff equals the full key-by-key diff") {
    val (prev, next) = snapshots
    val full = prev.withColumnRenamed("h", "h_old")
      .join(next.withColumnRenamed("h", "h_new"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("c"))
      .filter(col("c") =!= "unchanged")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val drilled = Curation.digestDiff(spark, sf, B).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(drilled == full)
    assert(full.nonEmpty)
  }

  test("digest stage prunes: dirty buckets and drilled keys are a fraction") {
    val (prev, next) = snapshots
    val diff = Curation.digestDiff(spark, sf, B).collect()
    val dirtyBuckets = diff.map(_.getLong(1)).toSet.size
    val affected = diff.length
    // dirty buckets bounded by affected keys, both far below B / corpus
    assert(dirtyBuckets <= affected)
    assert(dirtyBuckets * 10 < B,
      s"$dirtyBuckets dirty of $B — profile not sparse enough to show pruning")
    // drill cost: keys living in dirty buckets ≪ corpus
    val dirtySet = diff.map(_.getLong(1)).toSet
    val drilledKeys = prev.withColumn("bucket",
        PortableHash.h60(col("doc_id").cast("string")) % B)
      .filter(col("bucket").isin(dirtySet.toSeq: _*)).count()
    val corpus = prev.count()
    assert(drilledKeys * 4 < corpus,
      s"drill reads $drilledKeys of $corpus keys — digests bought nothing")
  }

  test("identical snapshots yield an empty diff") {
    val (prev, _) = snapshots
    def digest(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("bucket",
        PortableHash.h60(col("doc_id").cast("string")) % B)
      .withColumn("rowh", PortableHash.h60(concat(
        col("doc_id").cast("string"), lit(":"), col("h").cast("string"))))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(rowh)").as("x"))
    val a = digest(prev).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = digest(prev).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b) // digests deterministic → zero dirty buckets
  }
}
