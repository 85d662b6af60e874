package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Every hash here is computable bit-identically by Spark (the Column
  * helpers) and by DuckDB SQL (the paired `*Sql` string generators), so the
  * LSH-family operators — minhash bands, simhash, hyperplane buckets — can
  * be verified end-to-end by the driver's DuckDB oracle (rows+schema+hash)
  * instead of a rows-only check. The previous xxhash64 basis had no DuckDB
  * counterpart.
  *
  * Base hash: the first 15 hex chars (60 bits) of md5 — non-negative, fits
  * a signed 64-bit integer in both engines (16 chars could exceed
  * Long.MaxValue). Per-slot minhash rehashes are universal-hash arithmetic
  * ((a*h + b) mod p, p = 2^31-1) whose per-slot constants come from a
  * splitmix-style mixer, so the Column and the generated SQL embed
  * identical literals and all intermediate products stay below 2^62 (no
  * overflow under Spark's ANSI mode or DuckDB's checked arithmetic).
  *
  * Scale note: md5 is ~3-4x the cost of xxhash64 per byte but is computed
  * once per token/shingle; the k=64 per-slot rehashes are 3 integer ops
  * each (vs 64 xxhash64 calls before) — the portable basis is net cheaper
  * at any scale.
  */
object PortableHash {
  /** Modulus for universal-hash slots: 2^31 - 1 (prime). */
  val P: Long = 2147483647L

  /** 60-bit md5-prefix hash of a string column (non-negative). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL computing exactly [[h60]]. */
  def h60Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  /** Universal-hash multiplier for minhash slot i (in 1..P-1). */
  def slotA(i: Int): Long = mix(2L * i + 1) % (P - 1) + 1

  /** Universal-hash offset for minhash slot i (in 0..P-1). */
  def slotB(i: Int): Long = mix(2L * i + 2) % P

  /** Minhash slot-i rehash of a base hash already reduced mod P. */
  def slotHash(i: Int, hModP: Column): Column =
    (lit(slotA(i)) * hModP + lit(slotB(i))) % P

  /** DuckDB SQL computing exactly [[slotHash]] (explicit BIGINT casts —
    * DuckDB integer literals default to INT32 and would overflow). */
  def slotHashSql(i: Int, e: String): String =
    s"(${slotA(i)}::BIGINT * $e + ${slotB(i)}::BIGINT) % $P"

  /** Order-sensitive polynomial fold of minhash slots into a band hash:
    * acc = (acc * 8191 + m) mod P. Values stay below 2^44. */
  def bandFold(cols: Seq[Column]): Column =
    cols.foldLeft(lit(0L): Column)((acc, m) => (acc * 8191L + m) % P)

  /** DuckDB SQL computing exactly [[bandFold]]. */
  def bandFoldSql(exprs: Seq[String]): String =
    exprs.foldLeft("(0::BIGINT)")((acc, m) => s"(($acc * 8191 + $m) % $P)")
}
