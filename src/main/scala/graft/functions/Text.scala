package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the document/training-data pipeline operators.
  *
  * Everything here is built from codegen-friendly `org.apache.spark.sql.
  * functions` (split/transform/aggregate/xxhash64), no Scala UDFs: the
  * expressions stay inside WholeStageCodegen (scalar parts) and scale
  * linearly with data volume, with no serialization of row payloads to the
  * JVM closure layer.
  *
  * Reference analogue: the tokenizer replaces the reference's IK-analyzer
  * UDTF (gmall-realtime app/func/KeywordUDTF.java:16-26,
  * utils/KeywordUtil.java:17-41) with a dependency-free segmentation:
  * lowercase latin/digit runs, plus CJK bigrams from `cjkBigrams`.
  */
object Text {
  /** Lowercased latin/digit tokens; empty tokens filtered. Mirrors the
    * DuckDB oracle `string_split_regex(lower(text), '[^a-z0-9]+')`. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** CJK-aware tokens: latin runs plus overlapping CJK character bigrams
    * (dictionary-free analogue of IK "smart" segmentation for our scope).
    * A lone CJK char between boundaries is emitted as a unigram. */
  def cjkTokens(text: Column): Column = {
    val latin = tokens(text)
    // runs of CJK chars -> overlapping bigrams
    val cjkRuns = filter(split(text, "[^\\u4e00-\\u9fff]+"), t => length(t) > 0)
    val bigrams = flatten(transform(cjkRuns, run =>
      when(length(run) === 1, array(run)).otherwise(
        transform(sequence(lit(1), length(run) - 1), i =>
          run.substr(i, lit(2))))))
    concat(latin, bigrams)
  }

  /** n-token shingles (default 3), distinct, joined by a single space.
    * Returns an empty array for docs shorter than n tokens. */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(shinglesPositional(toks, n))

  /** Positional (non-distinct, document-order) n-token shingles — the form
    * rolling-hash winnowing needs, where position matters.
    *
    * Two equivalent forms, picked by n (A/B-measured at sf0.1): per-token
    * `element_at` wins for small n (n=3: 1.3 s vs 1.6 s over the corpus),
    * a single `slice` per position wins once n is large enough that n
    * interpreted element_at calls cost more than one array allocation
    * (n=13: 2.3 s vs 3.0 s). Both produce the identical space-joined
    * string, verified by exceptAll in TextSpec. */
  def shinglesPositional(toks: Column, n: Int = 3): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        if (n >= 8) concat_ws(" ", slice(toks, i, lit(n)))
        else concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))

  /** MinHash signature: each shingle string is hashed ONCE (xxhash64); the
    * k "independent" hash functions re-hash that base long together with
    * the function index — integer-domain xxhash64, no string re-hashing
    * (which dominates cost at scale) and no overflow under ANSI mode. */
  def minhashSignature(shingleCol: Column, k: Int = 64): Column = {
    val baseHashes = transform(shingleCol, s => xxhash64(s))
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(baseHashes, h => xxhash64(i, h))))
  }

  /** LSH band hashes from a minhash signature: `b` bands of `r` rows each;
    * docs sharing any band hash are near-dup candidates. */
  def bandHashes(sig: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)), bi =>
      xxhash64(bi, slice(sig, bi * lit(r) + 1, lit(r))))

  /** 64-bit SimHash over a token array: textbook construction — one
    * xxhash64 per token, sign-sum each of its 64 bits, assemble the
    * majority bits. One string hash per token; the bit loop is integer
    * shifts. Pure SQL higher-order functions — no UDF, no shuffle. */
  def simhash64(toksExprSql: String): Column = expr(
    s"""aggregate(
       |  transform($toksExprSql, t -> xxhash64(t)),
       |  array_repeat(0L, 64),
       |  (acc, h) -> zip_with(acc, sequence(0, 63),
       |                (a, i) -> a + ((shiftright(h, i) & 1) * 2 - 1)),
       |  acc -> aggregate(sequence(0, 63), 0L,
       |           (s, i) -> s + if(element_at(acc, i + 1) > 0, shiftleft(1L, i), 0L)))"""
      .stripMargin)

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: String, b: String): Column =
    expr(s"bit_count($a ^ $b)")
}
