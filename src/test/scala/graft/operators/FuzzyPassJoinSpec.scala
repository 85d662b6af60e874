package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q101's lossless two-level PassJoin candidate generation: the round-9
  * replacement for the raw prefix-block self-join (the r8 board's one
  * super-linear query). Pins (1) result equality with the brute-force
  * oracle algorithm, (2) the hot-prefix block cap the VERDICT asked for,
  * (3) mixed/short length handling the real corpus never exercises. */
class FuzzyPassJoinSpec extends SparkSpec {

  /** The oracle's own algorithm, inline: brute join within prefix blocks. */
  private def brute(heads: DataFrame, prefixLen: Int = 4,
                    maxDist: Int = 5): Set[(Long, Long, Long)] =
    heads.as("a").join(heads.as("b"),
        substring(col("a.head"), 1, prefixLen) ===
          substring(col("b.head"), 1, prefixLen) &&
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist",
        levenshtein(col("a.head"), col("b.head"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("a.doc_id"), col("b.doc_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def verify(heads: DataFrame, cand: DataFrame, prefixLen: Int = 4,
                     maxDist: Int = 5): Set[(Long, Long, Long)] =
    cand
      .join(heads.select(col("doc_id").as("id_a"), col("head").as("ha")), "id_a")
      .join(heads.select(col("doc_id").as("id_b"), col("head").as("hb")), "id_b")
      .filter(substring(col("ha"), 1, prefixLen) ===
        substring(col("hb"), 1, prefixLen))
      .withColumn("dist", levenshtein(col("ha"), col("hb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("q101 passjoin result equals the brute-force block join on real data") {
    val heads = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), "[^a-z0-9 ]+", ""),
          1, 40).as("head"))
    val expected = brute(heads)
    val got = Dedup.fuzzyHeadPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected, "passjoin candidates dropped or invented pairs")
    assert(got.nonEmpty, "fixture has no fuzzy pairs — test is vacuous")
  }

  test("q101 planted hot-prefix block: candidates stay far below quadratic") {
    import spark.implicits._
    // 240 docs ALL sharing the 4-char prefix (and first word), tails drawn
    // deterministically from a word salad — the exact shape that made the
    // raw block join quadratic. Three planted near-dup pairs must survive.
    // vocabulary shaped like the real synthetic corpus (~30 words) — the
    // candidate cut of any LOSSLESS scheme is entropy-bound, so the
    // fixture must match the corpus's per-char entropy to be meaningful
    val vocab = Vector("join", "scan", "sort", "group", "merge", "batch",
      "query", "table", "value", "filter", "stream", "column", "spark",
      "order", "line", "part", "data", "hash", "key", "big", "small",
      "fast", "slow", "the", "row", "agg", "window", "vector", "customer",
      "a")
    def tail(seed: Int): String = {
      var x = seed * 2654435761L & 0x7fffffffL
      val sb = new StringBuilder
      while (sb.length < 34) {
        x = (x * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffL
        sb.append(vocab((x % vocab.size).toInt)).append(' ')
      }
      sb.toString.substring(0, 34)
    }
    val base = (0 until 240).map(i => (i.toLong, "theta " + tail(i)))
    // planted: one char substituted mid-tail (dist 1), two chars (dist 2),
    // and an exact duplicate (dist 0)
    def mutate(h: String, at: Int): String =
      h.substring(0, at) + (if (h(at) == 'z') 'y' else 'z') + h.substring(at + 1)
    val planted = Seq(
      (1000L, mutate(base(7)._2, 20)),
      (1001L, mutate(mutate(base(11)._2, 15), 30)),
      (1002L, base(23)._2))
    val heads = (base ++ planted).toDF("doc_id", "head")
    val nDocs = base.size + planted.size
    val blockPairs = nDocs.toLong * (nDocs - 1) / 2 // one block = all pairs
    val cand = Dedup.fuzzyHeadCandidates(spark, heads)
    val nCand = cand.count()
    assert(nCand < blockPairs / 5,
      s"hot block not capped: $nCand candidates vs $blockPairs block pairs")
    val got = verify(heads, cand)
    val expected = brute(heads)
    assert(got === expected)
    assert(Set((7L, 1000L), (11L, 1001L), (23L, 1002L))
      .subsetOf(got.map(t => (t._1, t._2))),
      s"planted near-dups missed: $got")
  }

  test("q101 short and mixed-length heads route through the fallback pool") {
    import spark.implicits._
    val heads = Seq(
      (1L, "hello world how are you doing today friend"),
      (2L, "hello w0rld how are you doing today friend"), // dist 1, long
      (3L, "hello"), (4L, "hell"), (5L, "hello!extra"), // shorts
      (6L, ""), (7L, ""), // empty heads: prefix "" == "" and dist 0
      (8L, "hellx"), // short, dist 1 from doc 3 within prefix "hell"
      (9L, "hello world how are you doing") // len 29 vs 42: outside maxDist
    ).toDF("doc_id", "head")
    val got = verify(heads, Dedup.fuzzyHeadCandidates(spark, heads))
    val expected = brute(heads)
    assert(got === expected)
    // sanity: the interesting pairs really are in the expected set
    val pairs = expected.map(t => (t._1, t._2))
    assert(pairs.contains((1L, 2L)), "long near-dup pair missing")
    assert(pairs.contains((6L, 7L)), "empty-head pair missing")
    assert(pairs.contains((3L, 8L)), "short fuzzy pair missing")
    assert(!pairs.contains((1L, 9L)), "length-gap pair must be excluded")
  }
}
