package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  test("q103 weighted sampling: rates track targets, membership is stable") {
    val rows = Stats.weightedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, w, nDocs, nSampled, achieved, target) =>
      assert(w >= 1 && w <= 8)
      assert(nSampled <= nDocs)
      assert(target === w * 1000000L / 32)
      assert(achieved === nSampled * 1000000L / nDocs)
    }
    // pooled over all strata the sampler must track its blended target
    // well within binomial noise at this n
    val total = rows.map(_._3).sum
    val sampled = rows.map(_._4).sum
    val expected = rows.map(r => r._3.toDouble * r._2 / 32).sum
    assert(math.abs(sampled - expected) / expected < 0.5,
      s"sampled $sampled vs expected $expected")
    // determinism: a second run keeps the identical counts (pure function
    // of doc_id — the reproducible-corpus-release property)
    val again = Stats.weightedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(again.toSet === rows.map(r => (r._1, r._2, r._4)).toSet)
  }

  test("q104 outlier audit: flags match a driver-side float recompute") {
    val flagged = Stats.outlierAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(flagged.nonEmpty)
    val raw = graft.Tables.load(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    flagged.foreach { case (et, nEvents, nOut) =>
      val vs = raw.filter(_._1 == et).map(_._2)
      assert(nEvents === vs.length.toLong)
      val n = vs.length.toDouble
      val mu = vs.sum / n
      val sd = math.sqrt(vs.map(x => (x - mu) * (x - mu)).sum / n)
      // the integer cross-multiplied test is EXACT; the float recompute
      // agrees except possibly at the knife-edge — allow none here since
      // cents-scale data sits far from exact 2-sigma boundaries
      val expect = vs.count(x => math.abs(x - mu) > 2 * sd).toLong
      assert(nOut === expect, s"$et: $nOut vs recomputed $expect")
    }
  }

  test("q105 revenue share: ppm shares cross-foot to their windows") {
    val rows = Stats.revenueShare(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val totalRev = rows.map(_._3).sum
    rows.groupBy(_._1).foreach { case (region, rs) =>
      val regionRev = rs.map(_._3).sum
      rs.foreach { case (_, n, rev, regShare, totShare) =>
        assert(regShare === rev * 1000000L / regionRev, s"$region/$n region")
        assert(totShare === rev * 1000000L / totalRev, s"$region/$n total")
      }
      // truncated shares within a window sum to <= 1e6 and recover it
      // within one ppm per member (floor-division remainder bound)
      val sum = rs.map(_._4).sum
      assert(sum <= 1000000L && sum > 1000000L - rs.length)
    }
  }

  test("q106 fan-out audit: every key in exactly one bucket; tails pinned") {
    val rows = Stats.fanoutAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val rels = rows.map(_._1).distinct.sorted
    assert(rels === Seq("lineitem_per_order", "lineitem_per_part",
      "orders_per_customer").sorted)
    rows.foreach { case (rel, bucket, nKeys, mn, mx) =>
      assert(nKeys >= 1)
      // bucket b holds fanouts in [2^b, 2^(b+1))
      assert(mn >= (1L << bucket) && mx < (1L << (bucket + 1)),
        s"$rel bucket $bucket bounds [$mn,$mx] escape")
    }
    // keys cross-foot: sum of n_keys per relation == distinct key count
    val orderKeys = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    assert(rows.filter(_._1 == "lineitem_per_order").map(_._3).sum === orderKeys)
  }

  test("q107 top-concat: strings recompute from a driver-side rank") {
    val rows = Stats.topPartsConcat(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val pr = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_name"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rc"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    rows.foreach { case (brand, topStr, nParts) =>
      val mine = pr.filter(_._1 == brand)
      assert(nParts === mine.length.toLong)
      val expect = mine.sortBy(p => (-p._3, p._2)).take(3).map(_._2).mkString(",")
      assert(topStr === expect, s"$brand: '$topStr' vs '$expect'")
    }
  }

  test("q108 cumulative reach: monotone, ends at the user universe") {
    val rows = Stats.cumulativeReach(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // cum_reach is the running sum of n_new and never decreases
    var run = 0L
    rows.foreach { case (_, nNew, nActive, cum) =>
      run += nNew
      assert(cum === run)
      assert(nActive >= nNew, "new users are active on their first day")
    }
    val universe = graft.Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.last._4 === universe)
  }

  test("q109 set ops: classes partition each year's cohort") {
    val m = Stats.yearCohortSetOps(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet === Set("both", "only_1995", "only_1996"))
    def yearCount(y: Int) = graft.Tables.load(spark, sf, "orders")
      .filter(expr(s"year(o_orderdate) = $y"))
      .select(col("o_custkey")).distinct().count()
    assert(m("both") + m("only_1995") === yearCount(1995))
    assert(m("both") + m("only_1996") === yearCount(1996))
  }

  test("q110 benford: shares cross-foot; expectations are the fixed table") {
    val rows = Stats.benfordAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (1L to 9L))
    val total = rows.map(_._2).sum
    rows.foreach { case (d, n, obs, exp) =>
      assert(obs === n * 1000000L / total)
      assert(exp === math.round(math.log10(1.0 + 1.0 / d) * 1e6))
    }
  }

  test("q119 skyline: survivors undominated, dropped sizes dominated") {
    val p = graft.Tables.load(spark, sf, "part").select(col("p_size"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val bestBySize = p.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._2).min }
    val got = Stats.skyline(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val frontier = got.map(g => g._1 -> g._2).toMap
    got.foreach { case (size, cents, nAt, _) =>
      assert(cents === bestBySize(size))
      assert(nAt === p.count(x => x._1 == size && x._2 == cents))
      // undominated: no larger size reaches this price or better
      assert(!bestBySize.exists { case (s2, c2) => s2 > size && c2 <= cents },
        s"size $size dominated")
    }
    bestBySize.keys.filterNot(frontier.contains).foreach { s =>
      assert(bestBySize.exists { case (s2, c2) =>
        s2 > s && c2 <= bestBySize(s) }, s"size $s dropped but undominated")
    }
  }

  test("q96 streaming twin: merged day state reports identically to batch") {
    val obs = graft.operators.Series.gapFillObs(spark, sf)
    // split the SOURCE rows (not the aggregate) three ways, aggregate each
    // slice with the same day grouping, fold
    val orders = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .withColumn("bucket", col("o_orderkey") % 3)
    var st = graft.streaming.SeriesStream.emptyDayState(spark)
    Seq(0L, 1L, 2L).foreach { b =>
      val slice = orders.filter(col("bucket") === b)
        .groupBy(datediff(col("o_orderdate").cast("date"),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("d"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
      st = graft.streaming.SeriesStream.mergeDayBatch(st, slice)
        .localCheckpoint(true)
    }
    val a = graft.operators.Series.gapFillFrom(st).collect().map(_.toSeq)
    val b = graft.operators.Series.gapFillFrom(obs).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("q134 chi-square: every cell matches a BigInt recompute; totals foot") {
    val rows = Stats.chiSquare(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val obs = rows.view.mapValues(_._1).toMap
    val n = BigInt(obs.values.sum)
    val rT = obs.groupBy(_._1._1).view.mapValues(v => BigInt(v.values.sum))
    val cT = obs.groupBy(_._1._2).view.mapValues(v => BigInt(v.values.sum))
    rows.foreach { case ((st, pr), (o, expMilli, contribPpm)) =>
      val (r, c) = (rT(st), cT(pr))
      assert(BigInt(expMilli) == r * c * 1000 / n)
      val d = BigInt(o) * n - r * c
      assert(BigInt(contribPpm) == d * d * 1000000 / (n * r * c),
        s"cell ($st,$pr)")
    }
    // every order lands in exactly one cell
    assert(n.toLong == graft.Tables.load(spark, sf, "orders").count())
  }

  test("q139 KS statistic matches a driver-side BigInt recompute") {
    val r = Stats.ksDrift(spark, sf).collect()(0)
    val (n1, n2, d, ppm, atV) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val rows = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"),
        col("o_orderpriority"))
      .collect().map(x => (x.getLong(0), x.getString(1) == "1-URGENT"))
    val a = rows.filter(_._2).map(_._1).sorted
    val b = rows.filterNot(_._2).map(_._1).sorted
    assert(a.length.toLong == n1 && b.length.toLong == n2)
    val values = (a ++ b).distinct.sorted
    var best = BigInt(0); var bestV = Long.MaxValue
    values.foreach { v =>
      val c1 = BigInt(a.count(_ <= v)); val c2 = BigInt(b.count(_ <= v))
      val dd = (c1 * b.length - c2 * a.length).abs
      if (dd > best) { best = dd; bestV = v }
    }
    assert(BigInt(d) == best)
    assert(atV == bestV)
    assert(BigInt(ppm) == best * 1000000 / (BigInt(n1) * n2))
  }

  test("q140 audit invariants: verified methods are exact-precision subsets") {
    val rows = Dedup.dedupQualityAudit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // minhash verifies candidates with exact jaccard at the SAME
    // threshold -> every pair is a true pair (precision exactly 10^6)
    val (nEx, nLsh, hitsLsh, _, precLsh) = rows("minhash_lsh")
    assert(nLsh == hitsLsh && (nLsh == 0 || precLsh == 1000000L))
    // ppjoin runs a STRICTLY tighter threshold -> also a subset
    val (_, nPp, hitsPp, _, _) = rows("ppjoin_t05")
    assert(nPp == hitsPp)
    // every method reports against the same truth size
    assert(rows.values.map(_._1).toSet == Set(nEx))
  }

  test("q140 sampled truth is exactly the full truth restricted to the sample") {
    import org.apache.spark.sql.functions._
    // the audit's sampled ground-truth leg must equal the FULL q16 pair
    // set filtered to pairs whose BOTH endpoints pass the q103 predicate —
    // sampling may not invent or move a single truth pair (it only
    // restricts the graded universe)
    val keep = graft.functions.PortableHash
      .h60(col("doc_id").cast("string")) < lit(8L << 55)
    val sampledIds = graft.Tables.load(spark, sf, "documents")
      .filter(keep).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val full = Dedup.ngramJaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sampled = Dedup.ngramJaccardPairs(spark, sf, sample = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sampled ===
      full.filter(p => sampledIds(p._1) && sampledIds(p._2)))
    // full mode is the unsampled audit (r8 semantics), still available
    val fullAudit = Dedup.dedupQualityAudit(spark, sf, sample = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fullAudit.values.toSet == Set(full.size.toLong))
  }

  test("q150 split balance: hash split passes, planted skew detected") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the real content-hash split must sit near the chi2 expectation
    // (mean = dof) on every dimension — an order of magnitude above it
    // would mean the split correlates with a stratum
    val rows = Stats.splitBalanceAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq("lang", "len_bucket", "source"))
    rows.foreach { case (dim, chi2, dof, n) =>
      assert(dof >= 1 && n > 0)
      assert(chi2 < 5L * dof * 1000000L,
        s"$dim: chi2_ppm $chi2 implausibly high for dof $dof")
    }
    // detector: a split that routes one lang entirely to train must blow
    // past the same gate on the lang dimension
    val skewed = (1 to 400).map { i =>
      val lang = if (i % 4 == 0) "de" else "en"
      val split = if (lang == "de") "train"
        else Seq("train", "val", "test")(i % 3)
      (split, lang, s"src${i % 5}", (i % 7).toString)
    }.toDF("split", "lang", "source", "len_bucket")
    val sk = Stats.splitBalanceFrom(skewed).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (chi2Lang, dofLang) = sk("lang")
    assert(chi2Lang > 10L * dofLang * 1000000L,
      s"planted lang skew not detected: $chi2Lang")
  }

  test("q149 k-anonymity ladder: monotone risk, literal level-0 recompute") {
    import org.apache.spark.sql.functions._
    val rows = Stats.kAnonymityAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(0L, 1L, 3L, 7L))
    // generalizing only merges groups: group count and rows-at-risk are
    // weakly decreasing up the ladder
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 <= a._3, "n_groups grew while generalizing")
        assert(b._5 <= a._5, "rows_at_risk grew while generalizing")
      case _ => ()
    }
    // the grand-total level can never be at risk on a >= k corpus
    assert(rows.last._4 === 0L && rows.last._5 === 0L)
    // level 0 recomputed literally
    val fine = graft.Tables.load(spark, sf, "documents")
      .groupBy(col("lang"), col("source"), expr("n_chars div 100"))
      .count().collect().map(_.getLong(3))
    val l0 = rows.head
    assert(l0._3 === fine.length)
    assert(l0._4 === fine.count(_ < 5))
    assert(l0._5 === fine.filter(_ < 5).sum)
  }
}
