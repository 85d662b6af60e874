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

  test("PII adversarial fixtures: Java-regex behavior pinned to RE2's") {
    // Shapes where Java's leftmost-first and RE2's leftmost-longest could
    // plausibly diverge (trailing dots, doubled dots before the TLD,
    // dot-runs in the local part, NBSP inside a URL, phone at sentence
    // end). Expected values below were produced by BOTH engines — DuckDB
    // 'regexp_extract_all'/'regexp_replace' and java.util.regex — and
    // agree on every fixture; this test pins the Java side so a pattern
    // edit that breaks cross-engine parity fails here first.
    val s = spark
    import s.implicits._
    val fixtures = Seq(
      (1L, "mail me at a@b.com. thanks", 1L, 0L, 0L, "mail me at <EMAIL>. thanks"),
      (2L, "x@y..com trailing", 1L, 0L, 0L, "<EMAIL> trailing"),
      (3L, "weird user@sub.domain..com end", 1L, 0L, 0L, "weird <EMAIL> end"),
      (4L, "first.last+tag@ex-ample.co.uk!", 1L, 0L, 0L, "<EMAIL>!"),
      (5L, "tld too short a@b.c here", 0L, 0L, 0L, "tld too short a@b.c here"),
      // \s is ASCII-only in both engines: the NBSP is NOT a boundary, so
      // the URL match swallows it and the following word
      (6L, "url http://x.com\u00a0nbsp tail", 0L, 1L, 0L, "url <URL> tail"),
      (7L, "url https://a.b/c?d=e#f end", 0L, 1L, 0L, "url <URL> end"),
      (8L, "phone 123-456.7890 and 555.123-4567.", 0L, 0L, 2L, "phone <PHONE> and <PHONE>."),
      // dot-run local part: the email match extends left through "dots..."
      (9L, "dots...a@b.com...z", 1L, 0L, 0L, "<EMAIL>...z"),
      (10L, "A@b.CoM.Org mixed", 1L, 0L, 0L, "<EMAIL> mixed"))
    val docs = fixtures.map { case (id, t, _, _, _, _) => (id, t) }.toDF("doc_id", "text")
    val out = TextQueries.piiScanDf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    import org.apache.spark.sql.functions._
    val expectedMd5 = fixtures.map { case (id, _, _, _, _, red) => (id, red) }
      .toDF("doc_id", "red").select(col("doc_id"), md5(col("red")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    fixtures.foreach { case (id, _, e, u, p, _) =>
      assert(out(id).getAs[Long]("email_ct") === e, s"email_ct doc $id")
      assert(out(id).getAs[Long]("url_ct") === u, s"url_ct doc $id")
      assert(out(id).getAs[Long]("phone_ct") === p, s"phone_ct doc $id")
      assert(out(id).getAs[String]("redacted_md5") === expectedMd5(id), s"redaction doc $id")
    }
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

  test("bigram lift: planted collocation scores above mixed filler pairs") {
    val s = spark
    import s.implicits._
    // 20 filler tokens per doc cycled at per-doc strides so filler
    // adjacencies mix across the vocabulary (lift near 1), then the
    // planted collocation "data lake" once per doc (lift ~ 1/p(data))
    val vocab = Array("red", "blue", "cat", "dog", "sun")
    val docs = (1 to 40).map { i =>
      val stride = i % 4 + 1
      val filler = (0 until 20).map(j => vocab((i + j * stride) % 5))
      (i.toLong, (filler :+ "data" :+ "lake").mkString(" "))
    }
    val out = TextQueries.bigramLiftDf(docs.toDF("doc_id", "text"), minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val colloc = out(("data", "lake"))
    assert(colloc > 10.0, s"collocation lift too low: $colloc")
    // mixed filler pairs hover near independence
    val frees = out.collect {
      case ((a, b), v) if vocab.contains(a) && vocab.contains(b) => v
    }
    assert(frees.nonEmpty)
    frees.foreach(v => assert(v > 0.3 && v < 3.0, s"filler pair lift off: $v"))
    assert(colloc > frees.max * 3)
  }

  test("q91 boilerplate grams: doc-frequency semantics, ordered, bounded") {
    import org.apache.spark.sql.functions._
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    val rows = TextQueries.boilerplateGrams(spark, sf, minDf = 5, topK = 50)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 50)
    // doc frequency can never exceed the corpus size, and every shingle
    // is exactly 3 tokens
    rows.foreach { case (sh, df) =>
      assert(df >= 5 && df <= nDocs)
      assert(sh.split(" ").length === 3, s"bad shingle: $sh")
    }
    // (df DESC, shingle ASC) ordering is total — re-running cannot reorder
    assert(rows.toSeq === rows.sortBy { case (sh, df) => (-df, sh) }.toSeq)
    // df really counts DOCS, not occurrences: the top shingle's df equals
    // the number of docs whose distinct shingle set contains it
    val (top, topDf) = rows.head
    val manual = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.Text.shingles(
          graft.functions.Text.tokens(col("text"))).as("sh"))
      .filter(array_contains(col("sh"), top)).count()
    assert(manual === topDf)
  }

  test("q111 vocab growth: cumulative types cross-foot with exact distincts") {
    import org.apache.spark.sql.functions._
    val rows = TextQueries.vocabGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted)
    // cumulative vocabulary is the running sum of per-bucket new types and
    // ends at the corpus-wide distinct token count
    var run = 0L
    rows.foreach { case (_, nTok, nNew, cum) =>
      run += nNew
      assert(cum === run)
      assert(nNew <= nTok, "more new types than occurrences")
    }
    val totalTypes = graft.Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    assert(rows.last._4 === totalTypes)
    // token occurrences cross-foot to the corpus total
    val totalToks = graft.Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.Text.tokens(col("text"))).as("t")).count()
    assert(rows.map(_._2).sum === totalToks)
  }

  test("q125 postings: df exact, lists sorted prefixes of the full postings") {
    import org.apache.spark.sql.functions._
    val posts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        explode(graft.functions.Text.tokens(col("text"))).as("term"))
      .distinct().collect()
      .map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    val got = TextQueries.postingsIndex(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.nonEmpty)
    got.foreach { case (term, df, postings) =>
      val full = posts(term)
      assert(df === full.length, s"$term df")
      assert(postings === full.take(10).mkString(","), s"$term postings")
    }
    // every qualifying term is present — the cut is df, nothing else
    assert(got.map(_._1).toSet === posts.filter(_._2.length >= 5).keySet)
  }
}
