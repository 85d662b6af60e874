package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q164-q166: the curation-policy family's structural invariants. */
class PolicySpec extends SparkSpec {

  test("q164 coverage: bounded, and recomputes exactly from raw tokens") {
    val cov = TextQueries.dupGramCoverage(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    cov.values.foreach { case (n, c, ppm) =>
      assert(c <= n, "covered positions exceed token count")
      assert(ppm <= 1000000L)
    }
    // independent driver-side recomputation over the whole corpus:
    // positional 3-grams, df over per-doc-distinct grams, covered
    // positions = union of spans of grams with df >= 2
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
    val gramsOf = docs.map { case (id, toks) =>
      id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .toVector
    }.toMap
    val dfMap = gramsOf.values.flatMap(_.distinct)
      .groupBy(identity).view.mapValues(_.size).toMap
    var nonZero = 0
    docs.foreach { case (id, toks) =>
      val covered = collection.mutable.Set.empty[Int]
      gramsOf(id).zipWithIndex.foreach { case (g, i) =>
        if (dfMap(g) >= 2) covered ++= (i to i + 2)
      }
      val (n, c, ppm) = cov(id)
      assert(n === toks.length.toLong, s"doc $id token count")
      assert(c === covered.size.toLong, s"doc $id covered mismatch")
      if (n > 0) assert(ppm === covered.size.toLong * 1000000L / n)
      if (c > 0) nonZero += 1
    }
    assert(nonZero > 0, "no doc has any duplicated gram — test is vacuous")
  }

  test("q165 keepers: keeper maximizes quality within its own cluster") {
    val clusters = Dedup.sharedClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    val rows = Dedup.dedupKeepers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val qual = {
      val stops = Seq("the","a","of","and","to","in","is","it","for","on",
        "der","die","das","und","ist","ein","zu","mit","von","nicht",
        "el","la","de","que","y","en","un","es","por","con",
        "le","et","est","une","dans","pour").toSet
      graft.Tables.load(spark, sf, "documents")
        .select(col("doc_id"), col("text")).collect().map { r =>
          val toks = r.getString(1).toLowerCase
            .split("[^a-z0-9]+").filter(_.nonEmpty)
          val q = if (toks.isEmpty) 0L
            else toks.count(stops) * 1000000L / toks.length
          r.getLong(0) -> q
        }.toMap
    }
    rows.foreach { case (cl, keeper, kq, n, dropped, _) =>
      val members = byCluster(cl)
      assert(members.contains(keeper), s"keeper $keeper not in cluster $cl")
      assert(n === members.size.toLong && dropped === n - 1)
      assert(kq === qual(keeper))
      members.foreach { m =>
        assert(qual(m) < kq || (qual(m) == kq && m >= keeper),
          s"cluster $cl: member $m beats keeper $keeper") }
    }
  }

  test("q166 kappa: cells cross-foot and the statistic recomputes exactly") {
    val r = Stats.filterAgreement(spark, sf).collect().head
    val (n, n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n11 + n10 + n01 + n00 === n)
    val po = BigInt(n11 + n00)
    val pe = BigInt(n11 + n10) * BigInt(n11 + n01) +
      BigInt(n01 + n00) * BigInt(n10 + n00)
    assert(BigInt(r.getLong(5)) === po * 1000000 / n)
    assert(BigInt(r.getLong(6)) === pe * 1000000 / (BigInt(n) * n))
    val kappa = (BigInt(n) * po - pe) * 1000000 / (BigInt(n) * n - pe)
    assert(BigInt(r.getLong(7)) === kappa)
    assert(r.getLong(7) >= -1000000L && r.getLong(7) <= 1000000L)
  }

  test("q171 temperature mix: flattens shares, realization recomputes exactly") {
    val rows = Curation.temperatureMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.length > 1, "needs multiple languages")
    // shares sum to ~1e6 (floor-division slack bounded by the group count)
    assert(math.abs(rows.map(_._4).sum - 1000000L) <= rows.length)
    assert(math.abs(rows.map(_._5).sum - 1000000L) <= rows.length)
    // α = 1/2 compresses the spread: the tempered max/min ratio can not
    // exceed the raw one (and strictly flattens when shares differ)
    val rawR = rows.map(_._4.toDouble).max / rows.map(_._4.toDouble).min
    val tmpR = rows.map(_._5.toDouble).max / rows.map(_._5.toDouble).min
    assert(tmpR <= rawR + 1e-9, s"temperature sharpened the mix: $tmpR > $rawR")
    // driver recompute of the full plan + realization
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split("[^a-z0-9]+")
          .count(_.nonEmpty).toLong
        (r.getString(0), toks, r.getString(1))
      }
    val hmods = {
      val s2 = spark; import s2.implicits._
      docs.map(_._3).toSeq.toDF("text")
        .select(graft.functions.PortableHash.h60(col("text")) % 1000000L)
        .collect().map(_.getLong(0))
    }
    val byLang = docs.zip(hmods).groupBy(_._1._1)
    val tot = docs.map(_._2).sum
    val sw = byLang.values.map(g =>
      math.sqrt(g.map(_._1._2).sum.toDouble).toLong).sum
    rows.foreach { case (lang, nDocs, nToks, rawPpm, tmpPpm, ratePpm,
        rDocs, rToks) =>
      val g = byLang(lang)
      assert(nDocs === g.length.toLong && nToks === g.map(_._1._2).sum)
      assert(rawPpm === nToks * 1000000L / tot)
      val w = math.sqrt(nToks.toDouble).toLong
      assert(tmpPpm === w * 1000000L / sw)
      assert(ratePpm === (w * 1000000L / sw) * tot / nToks)
      val keeps = g.map { case ((_, nt, _), hm) =>
        val k = ratePpm / 1000000L + (if (hm < ratePpm % 1000000L) 1L else 0L)
        (k, k * nt)
      }
      assert(rDocs === keeps.map(_._1).sum && rToks === keeps.map(_._2).sum)
      // the realized token mass lands near the tempered target (the
      // fractional Bernoulli's deviation is bounded by one doc per point)
      val target = tmpPpm.toDouble / 1000000 * tot
      assert(math.abs(rToks - target) < tot * 0.05,
        s"$lang realized $rToks vs target $target")
    }
  }

  test("q171 temperature mix: zero-token language yields 0 ppm, no ANSI throw") {
    // A language whose documents all tokenize to empty under the
    // [^a-z0-9]+ tokenizer (routine for non-Latin scripts) must not
    // DIVIDE_BY_ZERO under ANSI mode; its ppm columns are all 0.
    val s2 = spark; import s2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q171").toString
    Seq(
      (1L, "en", "alpha beta gamma delta epsilon"),
      (2L, "en", "beta gamma delta"),
      (3L, "zz", "你好世界"), // tokenizes to nothing
      (4L, "zz", "こんにちは")
    ).toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Curation.temperatureMix(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val (zToks, zRaw, zTmp, zRate, zDocs, zRtoks) = rows("zz")
    assert(zToks === 0L)
    assert(zRaw === 0L && zTmp === 0L && zRate === 0L)
    assert(zDocs === 0L && zRtoks === 0L)
    // the token-bearing language carries the whole mixture
    val (eToks, eRaw, eTmp, eRate, _, _) = rows("en")
    assert(eToks === 8L && eRaw === 1000000L && eTmp === 1000000L)
    assert(eRate === 1000000L)
  }

  test("q175 fertility: cross-foots word counts, bounded ratios, all langs") {
    val rows = TextQueries.tokenizerFertility(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val direct = graft.Tables.load(spark, sf, "documents")
      .select(col("lang"),
        explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === direct.keySet && rows.size > 1)
    rows.foreach { case (lang, (nWords, spw, spc)) =>
      assert(nWords === direct(lang), s"$lang word count")
      // >= 1 symbol per word; the end-marker bounds symbols by chars+1
      assert(spw >= 1000000L, s"$lang fertility under 1 sym/word")
      assert(spc <= 2000000L, s"$lang symbols exceed chars+marker")
    }
  }

  test("q172 dup spans: one shared paragraph = one maximal span; structure exact") {
    val s2 = spark; import s2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q172").toString
    // 12-token shared paragraph inside two otherwise-unique docs: every
    // 8-gram window of it repeats cross-doc, and the covered positions
    // must merge to ONE span of exactly 12 tokens per doc.
    val para = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val u1 = (1 to 10).map(i => s"unique1x$i").mkString(" ")
    val u2 = (1 to 10).map(i => s"unique2x$i").mkString(" ")
    val u3 = (1 to 20).map(i => s"unique3x$i").mkString(" ")
    val u4 = (1 to 20).map(i => s"unique4x$i").mkString(" ")
    Seq(
      (1L, s"$u1 $para $u2"),   // span at positions 11..22
      (2L, s"$para $u3"),       // span at positions 1..12
      (3L, u4 + " tail")        // no repeated 8-grams
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextQueries.dupSpans(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rows(1L) === ((32L, 1L, 12L, 12L)))
    assert(rows(2L) === ((32L, 1L, 12L, 12L)))
    assert(rows(3L) === ((21L, 0L, 0L, 0L)))
    // q174 policy on the same fixture: the 12-token span (>= minSpan 10)
    // is stripped; an 8-token accidental overlap is kept
    val eight = "p1 p2 p3 p4 p5 p6 p7 p8"
    Seq(
      (1L, s"$u1 $para $u2"),
      (2L, s"$para $u3"),
      (3L, u4 + " tail"),
      (4L, s"$eight uniq4a uniq4b uniq4c"),
      (5L, s"uniq5a uniq5b $eight uniq5c")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val strip = TextQueries.spanStrip(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(strip(1L)._1 === 12L && strip(2L)._1 === 12L)
    assert(!strip(1L)._2.contains("alpha") && strip(1L)._2.contains("unique1x1"))
    assert(strip(2L)._2 === u3, "doc2 keeps exactly its unique tail")
    // the short shared run survives the policy (n_removed = 0)
    assert(strip(4L)._1 === 0L && strip(4L)._2.contains("p1"))
    assert(strip(5L)._1 === 0L && strip(5L)._2.contains("p8"))
    // real corpus: spans are well-formed (max_span <= covered <= n_tokens,
    // n_spans = 0 iff covered = 0) and some doc has dup structure
    val real = TextQueries.dupSpans(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    real.foreach { case (n, ns, mx, cov) =>
      assert(cov <= n && mx <= cov)
      assert((ns == 0L) === (cov == 0L))
      assert(ns == 0L || mx * ns >= cov || mx <= cov)
    }
    assert(real.exists(_._2 > 0L), "fixture corpus has repeated 8-grams")
  }
}
