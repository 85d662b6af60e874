package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-9 streaming twins (q151 novelty, q152 effective size, q158
  * distinct-n): streamed state folded over uneven doc_id-ordered splits
  * (plus a re-delivered batch — the at-least-once discipline) must equal
  * the batch query bit-for-bit. */
class TextStatsStreamSpec extends SparkSpec {

  /** The corpus in four uneven doc_id-ordered slices. */
  private def slices: Seq[DataFrame] = {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val cuts = Seq(ids.length / 6, ids.length / 2, ids.length * 5 / 6)
    (Seq(0) ++ cuts ++ Seq(ids.length)).sliding(2).map {
      case Seq(a, b) =>
        val lo = ids(a)
        val hi = if (b == ids.length) Long.MaxValue else ids(b)
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    }.toSeq
  }

  test("q158 twin: distinct-n over uneven splits + re-delivery equals batch") {
    var state = DistinctNStream.emptyState(spark)
    var seen = TextStatsStream.emptySeen(spark)
    slices.zipWithIndex.foreach { case (sl, i) =>
      val r = DistinctNStream.mergeBatch(state, seen, sl)
      state = r._1; seen = r._2
      if (i == 2) { // at-least-once: re-deliver the third batch
        val r2 = DistinctNStream.mergeBatch(state, seen, sl)
        state = r2._1; seen = r2._2
      }
    }
    val streamed = DistinctNStream.report(spark, state).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = graft.operators.TextQueries.distinctN(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("q151 twin: novelty emitted on arrival equals batch, ordered ingest") {
    var state = NoveltyStream.emptyState(spark)
    var seen = TextStatsStream.emptySeen(spark)
    var outs = Seq.empty[(Long, Long, Long, Any)]
    slices.zipWithIndex.foreach { case (sl, i) =>
      val r = NoveltyStream.mergeBatch(state, seen, sl)
      state = r._1; seen = r._2
      outs ++= r._3.collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) null else x.getLong(3)))
      if (i == 0) { // re-delivery emits nothing and moves no state
        val r2 = NoveltyStream.mergeBatch(state, seen, sl)
        assert(r2._3.isEmpty, "re-delivered batch re-emitted rows")
        state = r2._1; seen = r2._2
      }
    }
    val batch = graft.operators.TextQueries.gramNovelty(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) null else x.getLong(3)))
    assert(outs.sortBy(_._1) === batch.toSeq.sortBy(_._1))
  }

  test("q152 twin: incremental clustering report equals batch at the end " +
      "and after every trigger prefix") {
    var hashes = EffectiveSizeStream.emptyHashes(spark)
    var bands = EffectiveSizeStream.emptyBands(spark)
    var labels = EffectiveSizeStream.emptyLabels(spark)
    slices.zipWithIndex.foreach { case (sl, i) =>
      val r = EffectiveSizeStream.mergeBatch(hashes, bands, labels, sl)
      hashes = r._1; bands = r._2; labels = r._3
      if (i == 1) { // at-least-once
        val r2 = EffectiveSizeStream.mergeBatch(hashes, bands, labels, sl)
        hashes = r2._1; bands = r2._2; labels = r2._3
      }
    }
    val streamed = EffectiveSizeStream.report(labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = graft.operators.TextQueries.effectiveSize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.toSeq === batch.toSeq)
    // arrival order must not matter for clustering: same corpus in
    // REVERSE slice order converges to the same report
    var h2 = EffectiveSizeStream.emptyHashes(spark)
    var b2 = EffectiveSizeStream.emptyBands(spark)
    var l2 = EffectiveSizeStream.emptyLabels(spark)
    slices.reverse.foreach { sl =>
      val r = EffectiveSizeStream.mergeBatch(h2, b2, l2, sl)
      h2 = r._1; b2 = r._2; l2 = r._3
    }
    val reversed = EffectiveSizeStream.report(l2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(reversed.toSeq === batch.toSeq)
  }

  test("q152 twin: a bridging doc merges two existing clusters exactly") {
    val s = spark
    import s.implicits._
    // two near-dup pairs far apart, then a bridge similar to both sides'
    // text: the label-level contraction must unite everything reachable
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val mk = (id: Long, t: String) => (id, t)
    val batch1 = Seq(mk(1, a), mk(2, a), mk(10, b), mk(11, b))
      .toDF("doc_id", "text")
    val bridge = Seq(mk(5, a + " " + b)).toDF("doc_id", "text")
    var hashes = EffectiveSizeStream.emptyHashes(spark)
    var bands = EffectiveSizeStream.emptyBands(spark)
    var labels = EffectiveSizeStream.emptyLabels(spark)
    // 64 bands × 1 row: detection probability at the bridge's J≈0.44
    // is 1−(1−J)^64 ≈ 1 (vs a coin flip at 16×4) — the merge mechanics are what
    // this fixture pins, not banding luck
    val r1 = EffectiveSizeStream.mergeBatch(hashes, bands, labels, batch1,
      nBands = 64)
    hashes = r1._1; bands = r1._2; labels = r1._3
    val before = labels.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(before(1L) === before(2L) && before(10L) === before(11L))
    assert(before(1L) !== before(10L))
    val r2 = EffectiveSizeStream.mergeBatch(hashes, bands, labels, bridge,
      nBands = 64)
    val after = r2._3.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(after.values.toSet.size === 1, s"bridge did not merge: $after")
    assert(after(10L) === 1L, "merged label is not the global minimum")
  }
}
