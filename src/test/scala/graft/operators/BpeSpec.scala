package graft.operators

import graft.SparkSpec

/** q133 BPE vocabulary learning: hand-computed fixture (including the
  * overlapping-pair greedy-merge case that breaks naive implementations),
  * determinism, and corpus-level sanity. */
class BpeSpec extends SparkSpec {

  private def learn(words: Seq[(String, Long)], rounds: Int) = {
    import spark.implicits._
    TextQueries.bpeMergesFrom(words.toDF("word", "freq"), rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
  }

  test("hand-computed merges on a tiny vocabulary") {
    // freq: low=5, lower=2, newest=6, widest=3
    // round 1 pair counts include: (e,s)=6+3=9, (s,t)=9, (w,e)=2+6+0=8...
    // (e,s) vs (s,t) tie at 9 -> lexicographic: (e,s) wins
    val m = learn(Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)), 3)
    assert(m(0) == ((1L, "e", "s", 9L)))
    // after merge 1: n e w es t _ (6), w i d es t _ (3) -> (es,t)=9 wins
    // over (l,o)=7 and (t,_)=9 tie -> (es,t) < (t,_) lexicographically
    assert(m(1) == ((2L, "es", "t", 9L)))
    // after merge 2: (est,_)=9 ties (l,o)=7? no: (est,_)=9 wins
    assert(m(2) == ((3L, "est", "_", 9L)))
  }

  test("greedy leftmost merge on overlapping pairs (aaaa)") {
    // 'aaaa' -> a a a a _ ; pair (a,a) counted 3 times but one merge
    // round rewrites greedily left-to-right: aa aa _
    val m = learn(Seq(("aaaa", 1L)), 2)
    assert(m(0) == ((1L, "a", "a", 3L)))
    // after round 1 the sequence is [aa, aa, _]: pairs (aa,aa)=1, (aa,_)=1
    // -> tie at 1, (aa,_) > (aa,aa) lexicographically? '_' < 'a' in ASCII,
    // so rhs '_' sorts first: (aa,_) loses to (aa,aa)? compare rhs: '_'=0x5f
    // < 'a'=0x61 -> (aa,_) sorts BEFORE (aa,aa) -> (aa,_) wins the tie
    assert(m(1) == ((2L, "aa", "_", 1L)))
  }

  test("a symbol suffix never false-matches a merge (xa + b vs a + b)") {
    // vocab: 'xab' (freq 3) and 'ab' (freq 2). Round 1: pairs
    // (x,a)=3, (a,b)=5, (b,_)=5 -> (a,b) wins tie vs (b,_)? 'a'<'b' yes.
    // Merging (a,b) must rewrite 'x a b _' -> 'x ab _' (NOT corrupt the
    // 'xa' prefix) and 'a b _' -> 'ab _'.
    val m = learn(Seq(("xab", 3L), ("ab", 2L)), 2)
    assert(m(0) == ((1L, "a", "b", 5L)))
    // round 2 pairs: (x,ab)=3, (ab,_)=5 -> (ab,_) wins
    assert(m(1) == ((2L, "ab", "_", 5L)))
  }

  test("deterministic on the real corpus and counts are monotone-ish") {
    val a = TextQueries.bpeMerges(spark, sf, rounds = 4).collect().toSeq
    val b = TextQueries.bpeMerges(spark, sf, rounds = 4).collect().toSeq
    assert(a == b)
    // each round's winning count can never exceed the previous round's
    // (merging only removes pair occurrences of the chosen pair; a later
    // round's max is <= earlier max by greedy argmax)
    val counts = a.map(_.getLong(3))
    assert(counts.zip(counts.tail).forall { case (x, y) => y <= x })
  }

  test("q148 encode: round-trips, respects merges, and compresses") {
    val rows = TextQueries.bpeEncode(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (word, _, encoded, n) =>
      val syms = encoded.split(" ")
      assert(syms.length.toLong === n)
      // concatenating the symbols reconstructs word + end marker
      assert(syms.mkString === word + "_", s"round-trip broke for $word")
      assert(syms.forall(_.nonEmpty))
    }
    // the learned merges genuinely fire: total encoded symbols must be
    // strictly below the character-level baseline (len + end marker)
    val base = rows.map { case (w, f, _, _) => f * (w.length + 1) }.sum
    val enc = rows.map { case (_, f, _, n) => f * n }.sum
    assert(enc < base, s"no compression: $enc vs $base")
    // the FINAL round's merge token (never consumed by a later merge)
    // must be visible in some encoding
    val lastTok = TextQueries.bpeMerges(spark, sf).collect()
      .maxBy(_.getLong(0)).getString(4)
    val symsSeen = rows.flatMap(_._3.split(" ")).toSet
    assert(symsSeen.contains(lastTok), s"final merge $lastTok unused")
  }
}
