package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q170: the paraphrase-robustness claim, pinned — a lightly edited copy
  * of a test-split document must be caught by winnow decontamination
  * while q56's exact-13-gram rule misses it. */
class WinnowDecontamSpec extends SparkSpec {

  private def bucketOf(texts: Seq[String]): Seq[Long] = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
      .select((graft.functions.PortableHash.h60(col("text")) % 100))
      .collect().map(_.getLong(0)).toSeq
  }

  test("q170 flags an edited eval copy that q56's exact grams miss") {
    val s = spark
    import s.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    // salt the eval doc into the test split (bucket >= 90): the split is
    // content-hashed, so membership is found, not assigned
    val evalCands = (0 until 400).map(i => base + s" salt$i")
    val evalText = evalCands.zip(bucketOf(evalCands))
      .collectFirst { case (t, b) if b >= 90 => t }.get
    // edit tokens 5/15/25: every 13-token gram of the copy contains at
    // least one edit (gaps < 13), so q56 can never match it; the intact
    // 3-gram winnow minima between the edits still match
    val toks = evalText.split(" ")
    def edited(j: Int): String = {
      val c = toks.clone()
      c(4) = s"aaa$j"; c(14) = s"bbb$j"; c(24) = s"ccc$j"
      c.mkString(" ")
    }
    val editCands = (0 until 400).map(edited)
    val trainText = editCands.zip(bucketOf(editCands))
      .collectFirst { case (t, b) if b < 80 => t }.get
    // filler train docs with disjoint vocabulary (no shared fingerprints)
    val fillers = (1 to 6).map(i =>
      (100L + i, (1 to 25).map(k => s"f${i}x$k").mkString(" ")))
    val docs = (fillers ++ Seq((1L, trainText), (2L, evalText)))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'w' AS source",
        "length(text) AS n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q170fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val flagged = Curation.winnowDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(flagged.contains(1L),
      s"edited eval copy not flagged by winnow decontamination: $flagged")
    assert(flagged(1L)._2 >= 2, "hit count below threshold")
    // the exact-gram rule misses the same doc (every 13-gram edited)
    val q56 = Curation.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(q56.getOrElse(1L, 0L) === 0L,
      s"q56 unexpectedly matched the edited copy: $q56")
    // fillers stay clean in both
    fillers.foreach { case (id, _) =>
      assert(!flagged.contains(id), s"filler $id falsely flagged") }
  }

  test("q170 hit accounting: hits never exceed fingerprints, ppm exact") {
    val rows = Curation.winnowDecontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty, "no flagged docs at this SF — vacuous")
    rows.foreach { case (_, split, nFp, nHits, ppm) =>
      assert(split == "train" || split == "val")
      assert(nHits >= 2 && nHits <= nFp)
      assert(ppm === nHits * 1000000L / nFp)
    }
  }
}
