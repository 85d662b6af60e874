package graft.operators

import graft.SparkSpec

/** q147: RRF hybrid retrieval invariants. */
class RrfSpec extends SparkSpec {

  test("q147 fusion credits recompute literally and ranks are contiguous") {
    val rows = TextQueries.hybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, qr) =>
      val rks = qr.map(_._2).sorted
      assert(rks.toSeq === (1L to rks.length), s"q$qid ranks not contiguous")
      assert(rks.length <= 10)
      // fused order is by (rrf_nano desc, doc_id)
      val ordered = qr.sortBy(_._2)
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
          s"q$qid fusion order broken at rank ${b._2}")
      }
    }
    rows.foreach { case (_, _, _, nano, trk, vrk) =>
      val expect = trk.map(r => 1000000000L / (60 + r)).getOrElse(0L) +
        vrk.map(r => 1000000000L / (60 + r)).getOrElse(0L)
      assert(nano === expect, s"credit mismatch: $nano vs $expect")
      assert(trk.isDefined || vrk.isDefined)
    }
    // hybrid is genuine: the fused lists draw on BOTH legs
    assert(rows.exists(r => r._5.isDefined && r._6.isEmpty))
    assert(rows.exists(r => r._6.isDefined && r._5.isEmpty))
  }

  test("q147 leg ranks agree with the standalone q46/q20 protocols") {
    // the vector leg's rank-1 doc per query must be the q20 brute-force
    // argmax (same rounded cosine, same tiebreak)
    val fused = TextQueries.hybridRrf(spark, sf).collect()
      .filter(r => !r.isNullAt(5) && r.getLong(5) == 1L)
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val brute = Similarity.bruteForceTopK(spark, sf, nQueries = 5, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    brute.foreach { case (qid, nid) =>
      // rank-1 vector doc appears in the fused top-10 with vec_rk 1
      // unless it fell off the fused cut (impossible: vec_rk 1 alone
      // gives 1e9/61 > any text-only rank >= 4 contribution)
      assert(fused.get(qid).contains(nid),
        s"q$qid: brute argmax $nid missing from fusion")
    }
  }
}
