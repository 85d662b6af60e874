package graft.operators

import graft.SparkSpec

class TextQueriesSpec extends SparkSpec {

  test("PII scan: counts, flag, and redaction fingerprint") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "contact me at jane.doe+x@example.org or https://ex.com/a?b=1 now"),
      (2L, "call 555-123-4567 or 555.987.6543"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextQueries.piiScanDf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("email_ct") === 1L)
    assert(out(1L).getAs[Long]("url_ct") === 1L)
    assert(out(1L).getAs[Long]("has_pii") === 1L)
    assert(out(2L).getAs[Long]("phone_ct") === 2L)
    assert(out(3L).getAs[Long]("has_pii") === 0L)
    // redaction removed the raw spans: hash equals md5 of placeholder text
    import org.apache.spark.sql.functions._
    val expected = Seq("contact me at <EMAIL> or <URL> now")
      .toDF("t").select(md5(col("t"))).head().getString(0)
    assert(out(1L).getAs[String]("redacted_md5") === expected)
  }

  test("BM25 keyword extraction: rare terms outrank corpus-wide terms") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "apple banana banana"),
      (2L, "banana cherry"),
      (3L, "banana date date date")).toDF("doc_id", "text")
    val out = TextQueries.bm25TopTermsDf(docs, topK = 2).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[String]("term")) }
    // banana appears in every doc (df=3) -> lowest idf; each doc's unique
    // term must rank first
    assert(byDoc(1L).head === "apple")
    assert(byDoc(2L).head === "cherry")
    assert(byDoc(3L).head === "date")
    assert(out.forall(_.getAs[Long]("rk") <= 2))
    assert(out.forall(_.getAs[Double]("score") > 0.0))
  }

  test("repetition metrics: duplicate token/bigram ratios, top token share") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"),          // 1 distinct of 4 tokens
      (2L, "all words here are different")) // no repetition
      .toDF("doc_id", "text")
    val out = TextQueries.repetitionDf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("dup_token_ratio") === 0.75)
    assert(out(1L).getAs[Double]("dup_bigram_ratio") > 0.6) // "spam spam" x3
    assert(out(1L).getAs[Double]("top_tok_share") === 1.0)
    assert(out(2L).getAs[Double]("dup_token_ratio") === 0.0)
    assert(out(2L).getAs[Double]("dup_bigram_ratio") === 0.0)
    assert(out(2L).getAs[Double]("top_tok_share") === 0.2)
  }
}
