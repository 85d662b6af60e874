package graft.operators

import graft.SparkSpec

/** q141: boilerplate removal + document reconstruction semantics on a
  * hand-computed fixture, plus corpus-level invariants. */
class BoilerplateStripSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], minDf: Long, topK: Int = 100) = {
    import spark.implicits._
    val docs = rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "length(text) AS n_chars")
    TextQueries.boilerplateStripDf(spark, docs, minDf, topK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
  }

  test("planted template is mined and stripped; unique text survives") {
    // "click here now" appears in 3 docs -> df=3 >= minDf=3; everything
    // else is unique (df=1) and must survive.
    val out = run(Seq(
      1L -> "alpha click here now beta",
      2L -> "click here now gamma delta",
      3L -> "epsilon zeta click here now"), minDf = 3)
    assert(out === Seq(
      (1L, 5L, 3L, "alpha beta"),
      (2L, 5L, 3L, "gamma delta"),
      (3L, 5L, 3L, "epsilon zeta")))
  }

  test("overlapping boilerplate occurrences merge through the cover union") {
    // both "a b c" and "b c d" are boilerplate (df=2 each); doc 1 contains
    // "a b c d" -> covered positions {1,2,3} U {2,3,4} = all four tokens,
    // each removed exactly ONCE (n_removed=4, not 6)
    val out = run(Seq(
      1L -> "x a b c d y",
      2L -> "a b c q q q q b c d"), minDf = 2)
    val d1 = out.find(_._1 == 1L).get
    assert(d1 === ((1L, 6L, 4L, "x y")))
  }

  test("docs shorter than the shingle width pass through untouched") {
    val out = run(Seq(
      1L -> "tiny doc",
      2L -> "one",
      3L -> "a b c", 4L -> "a b c", 5L -> "a b c", 6L -> "a b c",
      7L -> "a b c"), minDf = 5)
    assert(out.find(_._1 == 1L).get === ((1L, 2L, 0L, "tiny doc")))
    assert(out.find(_._1 == 2L).get === ((2L, 1L, 0L, "one")))
    // while the 5x-repeated full-doc template is fully erased
    assert(out.find(_._1 == 3L).get === ((3L, 3L, 3L, "")))
  }

  test("df counts DOCUMENTS, not occurrences") {
    // "p q r" occurs 3x inside one doc: df=1 < minDf=2 -> kept
    val out = run(Seq(
      1L -> "p q r p q r p q r",
      2L -> "unrelated filler words here"), minDf = 2)
    assert(out.find(_._1 == 1L).get._4 === "p q r p q r p q r")
  }

  test("q151 novelty: doc 0 fully novel, every gram novel exactly once") {
    val rows = TextQueries.gramNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    // the first doc's grams can have no earlier occurrence
    val d0 = rows.find(_._1 == 0L).get
    assert(d0._2 > 0 && d0._3 === d0._2 && d0._4 === 1000000L)
    rows.foreach { case (_, ng, nn, ppm) =>
      assert(nn <= ng)
      if (ng > 0) assert(ppm === nn * 1000000L / ng) else assert(ppm === -1L)
    }
    // every gram is novel somewhere exactly once: sum of novel counts ==
    // number of distinct grams in the corpus
    val distinctGrams = graft.Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.Text.shingles(graft.functions.Text.tokens(
          org.apache.spark.sql.functions.col("text")))).as("g"))
      .distinct().count()
    assert(rows.map(_._3).sum === distinctGrams)
  }

  test("q152 effective size: cross-foots docs, tokens, and exact weights") {
    import org.apache.spark.sql.functions._
    val rows = TextQueries.effectiveSize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(rows.map(r => r._1 * r._2).sum === docs.count())
    val totalToks = docs
      .select(size(graft.functions.Text.tokens(col("text"))).cast("long")
        .as("nt"))
      .agg(sum(col("nt"))).head.getLong(0)
    assert(rows.map(_._3).sum === totalToks)
    // singletons keep full weight; larger sizes divide within one
    // micro-token per cluster
    rows.foreach { case (sz, nc, raw, eff) =>
      if (sz == 1) assert(eff === raw * 1000000L)
      else {
        assert(eff <= raw * 1000000L / sz + nc) // flooring slack per cluster
        assert(eff > (raw * 1000000L / sz) - 1000000L * nc)
      }
    }
  }

  test("q154 co-occurrence: hand-computed window pairs and weights") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // "a b c": window 5 covers all pairs: (a,b,d1,w5) (a,c,d2,w4) (b,c,d1,w5)
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'w' AS source",
        "length(text) AS n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q154fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.cooccurrence(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out === Set(("a", "b", 1L, 5L), ("a", "c", 1L, 4L),
      ("b", "c", 1L, 5L)))
    // real corpus: weighted >= n_cooc (min weight 1), pairs are ordered
    // by position not alphabet, and the cut is the declared total order
    val real = TextQueries.cooccurrence(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(real.length === 50)
    real.foreach { case (_, _, n, w) => assert(w >= n && w <= 5 * n) }
    val sorted = real.sortBy(t => (-t._4, t._1, t._2))
    assert(real.toSeq === sorted.toSeq)
  }

  test("q155 dataset card: every number recomputes from its own protocol") {
    import org.apache.spark.sql.functions._
    val card = TextQueries.datasetCard(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(card("n_docs") === docs.count())
    assert(card("n_langs") ===
      docs.select(col("lang")).distinct().count())
    assert(card("near_dup_docs") === Dedup.sharedClusters(spark, sf).count())
    assert(card("near_dup_ppm") ===
      card("near_dup_docs") * 1000000L / card("n_docs"))
    assert(card("pii_ppm") === card("pii_docs") * 1000000L / card("n_docs"))
    // largest language share is a plurality but not everything
    assert(card("top_lang_ppm") >= 1000000L / card("n_langs"))
    assert(card("top_lang_ppm") <= 1000000L)
    assert(card("exact_dup_docs") >= 0 &&
      card("exact_dup_docs") <= card("n_docs"))
  }

  test("q156 percentile normalization: bounds, endpoints, monotonicity") {
    val rows = TextQueries.percentileNormalize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._2).foreach { case (lang, lr) =>
      val sorted = lr.sortBy(t => (t._3, t._1))
      assert(sorted.head._4 === 0L, s"$lang: min doc not at percentile 0")
      if (lr.length > 1)
        assert(sorted.last._4 === 1000000L, s"$lang: max doc not at 1e6")
      // percentile is monotone in the (n_tokens, doc_id) order
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4 <= b._4, s"$lang: percentile not monotone")
      }
    }
    assert(rows.forall(r => r._4 >= 0 && r._4 <= 1000000L))
  }

  test("q158 distinct-n: totals step down by corpus docs, diversity rises") {
    val rows = TextQueries.distinctN(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    // total n-grams drop by (n-1) per doc long enough: total(n) >=
    // total(n+1), and distinct counts grow with n while bounded by total
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a._2 >= b._2, "gram totals must shrink with n")
      assert(a._3 <= b._3, "distinct grams must grow with n")
    }
    rows.foreach { case (_, total, nd, ppm) =>
      assert(nd <= total)
      assert(ppm === nd * 1000000L / total)
    }
    // unigram distinct == corpus vocabulary
    val vocab = graft.Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.Text.tokens(
          org.apache.spark.sql.functions.col("text"))).as("t"))
      .distinct().count()
    assert(rows.head._3 === vocab)
  }

  test("q159 epoch shuffle: true permutations, distinct orders, reproducible") {
    val rows = TextQueries.epochShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet === Set(1L, 2L))
    byEpoch.foreach { case (e, er) =>
      // a permutation: positions are exactly 1..n, each doc exactly once
      assert(er.map(_._2).sorted.toSeq === (1L to nDocs), s"epoch $e broken")
      assert(er.map(_._3).distinct.length === nDocs.toInt)
    }
    // the two epochs order the corpus DIFFERENTLY...
    val o1 = byEpoch(1L).sortBy(_._2).map(_._3).toSeq
    val o2 = byEpoch(2L).sortBy(_._2).map(_._3).toSeq
    assert(o1 !== o2)
    // ...and differently from doc_id order (it genuinely shuffles)
    assert(o1 !== o1.sorted)
    // resume guarantee: a re-run reproduces the identical order
    val again = TextQueries.epochShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("q160 curriculum: levels ascend, in-level order shuffled, complete") {
    val rows = TextQueries.curriculumOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_._1).sorted.toSeq === (1L to nDocs))
    assert(rows.map(_._3).distinct.length === nDocs.toInt)
    // difficulty levels are non-decreasing along the training order
    val byPos = rows.sortBy(_._1)
    byPos.zip(byPos.tail).foreach { case (a, b) =>
      assert(a._2 <= b._2, s"level dropped at position ${b._1}")
    }
    assert(rows.map(_._2).distinct.length > 1, "degenerate single level")
    // within a level the order is hash-shuffled, not doc_id-sorted
    val lvl0 = byPos.filter(_._2 == byPos.head._2).map(_._3).toSeq
    assert(lvl0 !== lvl0.sorted, "level 0 not shuffled")
  }

  test("corpus invariants at sf0.001: token conservation and monotone df") {
    import org.apache.spark.sql.functions._
    val out = TextQueries.boilerplateStrip(spark, sf)
    // kept + removed == total tokens, and cleaned re-tokenizes to kept
    val bad = out.withColumn("n_kept",
        size(filter(split(col("cleaned"), " "), t => length(t) > 0)))
      .filter(col("n_kept") + col("n_removed") =!= col("n_tokens"))
    assert(bad.count() === 0)
    // a stricter threshold can only remove fewer tokens
    val strict = TextQueries.boilerplateStrip(spark, sf, minDf = 50)
    val loose = out.agg(sum("n_removed")).head.getLong(0)
    val tight = strict.agg(sum("n_removed")).head.getLong(0)
    assert(tight <= loose)
  }
}
