package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q188 CCNet-style perplexity buckets: exact-tercile structure over the
  * corpus plus a planted fluency ordering through the `Of` entry point. */
class PplBucketsSpec extends SparkSpec {

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  test("q188: exact terciles over the scored population, head beats tail") {
    val rows = TextQueries.pplBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byBucket = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // exact global terciles: bucket doc counts differ by at most 1
    assert(byBucket.values.max - byBucket.values.min <= 1)
    // the scored population is exactly the docs with >= 2 tokens
    val scored = graft.Tables.load(spark, sf, "documents")
      .select(size(graft.functions.Text.tokens(col("text"))).as("n"))
      .filter(col("n") >= 2).count()
    assert(byBucket.values.sum === scored)
    // fluency ordering: doc-weighted mean xent strictly increases
    def wmean(b: String): Double = {
      val rs = rows.filter(_._1 == b)
      rs.map(r => r._5.toDouble * r._3).sum / rs.map(_._3).sum
    }
    assert(wmean("head") < wmean("middle") && wmean("middle") < wmean("tail"))
  }

  test("q188: planted corpus ranks fluent < mid < gibberish") {
    import spark.implicits._
    // pad each text until it hashes into the train bucket, so all three
    // docs both fit the LM and are scored (terciles of 3 = 1 doc each)
    def trainText(base: String): String =
      Iterator.from(0).map(i => s"$base pad$i")
        .filter(t => h60(t) % 100 < 80).next()
    val lo = trainText(Seq.fill(40)("a b").mkString(" "))   // dense bigram
    val mid = trainText(Seq.fill(5)("c d").mkString(" "))   // sparse bigram
    val hi = trainText((1 to 12).map(i => s"z$i").mkString(" ")) // all count-1
    val docs = Seq((1L, "lo", lo), (2L, "mid", mid), (3L, "hi", hi))
      .toDF("doc_id", "source", "text")
    val out = TextQueries.pplBucketsOf(docs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("head" -> "lo", "middle" -> "mid", "tail" -> "hi"))
  }
}
