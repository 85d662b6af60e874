package graft.operators

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The q16/q131 crossover router (VERDICT r13 #5): SCALING.md's df-sketch
  * rule as code. Two corpus shapes, one per route:
  *
  *  - the repo's 31-word synthetic fixture has a near-UNIFORM shingle df
  *    distribution (head ratio ~2×) → the brute inverted-index join wins
  *    and the router must pick it;
  *  - a planted Heaps-law corpus (a handful of stop-grams in every doc +
  *    a long near-unique tail) head-dominates Σ C(df,2) → the router
  *    must pick PPJoin.
  *
  * On each shape the routed output must equal the routed leg's own
  * result exactly (same pair set, same jaccard) — the router adds a
  * `method` column, never changes the answer. */
class SimilarityJoinAutoSpec extends SparkSpec {

  private def shingleRows(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    .select(col("doc_id"), explode(Text.shingles(col("toks"), 3)).as("shingle"))

  /** Deterministic Heaps-law-ish corpus: every doc opens with the same
    * three stop tokens (df = nDocs shingles), then continues with tokens
    * unique to the doc (df = 1 shingles) — except paired docs (2k, 2k+1)
    * that share their tail, so the corpus has genuine J ≥ 0.5 pairs for
    * the routed leg to find. No RNG: token text is a pure function of
    * (doc, position). */
  private def heapsCorpus(nDocs: Int, tailLen: Int): DataFrame = {
    import spark.implicits._
    (0 until nDocs).map { d =>
      val pair = d / 2 // shared tail id for the (2k, 2k+1) pair
      val tail = (0 until tailLen).map(i => s"tok${pair}x$i").mkString(" ")
      // an odd doc diverges in ONE token so the pair is near- but not
      // exact-dup (J just under 1, well above the 0.5 threshold)
      val tweaked = if (d % 2 == 1) tail.replace(s"tok${pair}x0", s"alt$pair")
                    else tail
      (d.toLong, s"the quick fox $tweaked")
    }.toDF("doc_id", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id_a"), col("id_b"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("near-uniform df corpus routes to the brute join") {
    val sh = shingleRows(
      graft.Tables.load(spark, sf, "documents")).persist()
    try {
      val (method, ratio) = Dedup.similarityJoinRouteFrom(sh, 10.0)
      assert(method === "brute",
        s"synthetic fixture must route brute (head ratio $ratio)")
      assert(ratio < 10.0 && ratio > 0.0)
      val routed = Dedup.similarityJoinAutoFrom(sh)
      assert(routed.select("method").distinct().collect()
        .map(_.getString(0)).toSeq === Seq("brute"))
      assert(pairSet(routed) === pairSet(
        Dedup.ngramJaccardPairsFrom(sh, 0.5)))
    } finally { sh.unpersist(false); () }
  }

  test("planted Heaps-law corpus routes to ppjoin, same answer") {
    val sh = shingleRows(heapsCorpus(nDocs = 400, tailLen = 12)).persist()
    try {
      val (method, ratio) = Dedup.similarityJoinRouteFrom(sh, 10.0)
      assert(method === "ppjoin",
        s"stop-gram head must route ppjoin (head ratio $ratio)")
      assert(ratio > 10.0)
      val routed = Dedup.similarityJoinAutoFrom(sh)
      assert(routed.select("method").distinct().collect()
        .map(_.getString(0)).toSeq === Seq("ppjoin"))
      val expected = pairSet(Dedup.ppjoinPairsFrom(sh))
      assert(pairSet(routed) === expected)
      // the planted (2k, 2k+1) near-dup pairs are all found
      assert(expected.map(p => (p._1, p._2)) ===
        (0 until 400 by 2).map(d => (d.toLong, d.toLong + 1)).toSet)
    } finally { sh.unpersist(false); () }
  }

  test("dir-level entry point routes and answers like the core") {
    val out = Dedup.similarityJoinAuto(spark, sf)
    val sh = shingleRows(graft.Tables.load(spark, sf, "documents"))
      .persist()
    try assert(pairSet(out) === pairSet(Dedup.ngramJaccardPairsFrom(sh, 0.5)))
    finally { sh.unpersist(false); () }
  }
}
