package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("q161 packing: offsets are contiguous and window spans conserve tokens") {
    val rows = Layout.sequencePack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // contiguity: each doc starts exactly where the previous one ended
    rows.sliding(2).foreach {
      case Array((_, n0, off0, _, _), (_, _, off1, _, _)) =>
        assert(off0 + n0 === off1, "packing left a gap or overlap")
      case _ => ()
    }
    rows.foreach { case (id, n, off, wf, nw) =>
      assert(wf === off / 2048, s"doc $id window_first wrong")
      if (n > 0) {
        assert(nw === (off + n - 1) / 2048 - off / 2048 + 1)
        // a doc spans at most ceil(n/ctx)+1 windows
        assert(nw <= n / 2048 + 2)
      } else assert(nw === 0)
    }
  }

  test("q162 HRW sharding: growing to S+1 shards moves ≈1/(S+1) of docs") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"))
    val s16 = Layout.shardOf(docs, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s17 = Layout.shardOf(docs, 17).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = s16.size
    val moved = s16.count { case (id, sh) => s17(id) != sh }
    // minimal disruption: expected n/17 ≈ 5.9%; assert within [1%, 15%]
    // (a modulo scheme would move ~15/17 ≈ 88%)
    assert(moved > n / 100, s"suspiciously few moved: $moved of $n")
    assert(moved < n * 15 / 100, s"not minimally disruptive: $moved of $n")
    // every doc that moved, moved TO the new shard 16 (HRW property:
    // adding a shard only ever steals, never reshuffles among old ones)
    s16.foreach { case (id, sh) =>
      if (s17(id) != sh) assert(s17(id) === 16L, s"doc $id reshuffled") }
  }

  test("q187 pack contamination: token mass conserved, m=1 clean, m>1 dirty") {
    val buckets = Layout.packContamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(buckets.nonEmpty)
    // token mass across all buckets == total tokens of the packed corpus
    val totalTokens = graft.Tables.load(spark, sf, "documents")
      .select(size(graft.functions.Text.tokens(col("text"))).cast("long")
        .as("n")).agg(sum(col("n"))).head().getLong(0)
    assert(buckets.map(_._3).sum === totalTokens, "token mass not conserved")
    buckets.foreach { case (m, nWin, toks, ppm) =>
      assert(m >= 1 && nWin >= 1 && toks >= 1)
      assert(ppm >= 0 && ppm < 1000000, s"bucket $m ppm out of range: $ppm")
      // a single-doc window has no cross-document pairs
      if (m === 1L) assert(ppm === 0L, "m=1 bucket must be contamination-free")
      // >=2 docs in a full window always produce cross-doc pairs
      if (m >= 2L && toks >= 2L * nWin)
        assert(ppm > 0L, s"bucket $m claims zero contamination")
    }
    // contamination grows with fragmentation: last bucket dirtier than first
    val multi = buckets.filter(_._1 >= 2).map(_._4)
    if (multi.length >= 2) assert(multi.last > multi.head)
  }

  test("q193 ctx sweep: mass conserved per candidate, tradeoff monotone") {
    val rows = Layout.ctxLenSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === Seq(512L, 1024L, 2048L, 4096L))
    val tok = rows.map(_._3).distinct
    assert(tok.length === 1, "token mass must not depend on ctxLen")
    rows.foreach { case (l, nw, t, clean, contam, pad) =>
      // dense packing: every window full except possibly the last
      assert(nw === (t + l - 1) / l, s"ctx $l window count")
      assert(clean >= 0 && clean <= 1000000)
      assert(contam >= 0 && contam < 1000000)
      // only the last window can be partial: pad share <= one window's
      // worth of the total, i.e. <= 1e6/n_windows (+1 integer slack)
      assert(pad >= 0 && pad <= 1000000L / nw + 1, s"ctx $l pad bound")
    }
    // the tradeoff: bigger windows fragment more docs (contamination up,
    // clean share down) but pad less in total share
    val byL = rows.sortBy(_._1)
    byL.map(_._5).sliding(2).foreach { case Array(a, b) => assert(a <= b)
      case _ => () }
    byL.map(_._4).sliding(2).foreach { case Array(a, b) => assert(a >= b)
      case _ => () }
  }

  test("q163 batching: length order never wastes more than arrival order") {
    val rows = Layout.lengthBatchingWaste(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nbA, padA, realA, wasteA) = rows("by_arrival")
    val (nbL, padL, realL, wasteL) = rows("by_length")
    assert(nbA === nbL)
    assert(realA === realL, "real token volume must not depend on order")
    assert(padL <= padA, "length bucketing increased padding")
    assert(wasteL <= wasteA)
    assert(padA >= realA && padL >= realL)
  }
}
