package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** K-Minimum-Values (KMV) approximate distinct count — the O(k)-state
  * sketch SURVEY §2.8 promises for the 100 TB track, on the engine-portable
  * [[PortableHash]] basis so it is verifiable BIT-EXACTLY by the DuckDB
  * oracle (unlike approx_count_distinct, whose HLL internals differ per
  * engine and would downgrade the check to rows-only).
  *
  * The estimator (Bar-Yossef et al. 2002): hash every value uniformly into
  * [0, 2^60); keep the k smallest DISTINCT hashes per group. If fewer than
  * k distinct hashes exist the count is exact; otherwise the k-th smallest
  * hash h_k estimates density and distinct ≈ (k-1) * 2^60 / h_k. Relative
  * error ~ 1/sqrt(k-2) (k=64 → ~13%).
  *
  * Scale design: this is a true bounded-state algebraic aggregate — the
  * buffer is a sorted Array[Long] of ≤ k entries, reduce is a binary
  * search + bounded insert, merge is a capped sorted-merge — so Spark runs
  * it with map-side partial aggregation and the shuffle carries ≤ k longs
  * per (group, partition), independent of group cardinality. The exact
  * COUNT DISTINCT twins (q03/q06/q39) shuffle every distinct value.
  *
  * Determinism contract with the oracle: the estimate divides exact
  * integers ((k-1) and 2^60 are exact doubles; their product has a 6-bit
  * significand) in ONE IEEE double division, then rounds half-away —
  * identical in JVM math.round and DuckDB round() for positive values.
  */
case class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Long] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) buf // distinct sketch: duplicates are no-ops
    else {
      val ins = -idx - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        // h displaces the current maximum; capacity stays k
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-distinct merge, capped at k — partials combine exactly
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { j += 1; b(j - 1) }
        else if (j >= b.length) { i += 1; a(i - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (a(i) > b(j)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) }
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Long =
    if (buf.length < k) buf.length.toLong
    else math.round((k - 1).toDouble * KmvDistinct.TwoPow60 / buf.last.toDouble)

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    Encoders.scalaLong
}

object KmvDistinct {
  /** 2^60 — the h60 hash range; exactly representable as a double. */
  val TwoPow60: Double = 1152921504606846976.0

  /** Untyped column form for DataFrame groupBy: kmv(col("h")). The input
    * column must already be the [[PortableHash.h60]] hash. */
  def columnAgg(k: Int = 64): UserDefinedFunction =
    udaf(KmvDistinct(k), Encoders.scalaLong)

  /** DuckDB SQL fragments mirroring [[KmvDistinct.finish]]: given a
    * per-group distinct-hash rank table (columns `nd` = min(distinct, k)
    * and `hk` = k-th smallest hash or NULL), the estimate expression. */
  def estimateSql(k: Int = 64): String =
    s"CASE WHEN nd < $k THEN nd " +
      s"ELSE CAST(round(${k - 1}.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)) AS BIGINT) END"

  /** Sketch-valued form: the same bounded-state aggregation, but the
    * FINISH returns the bottom-k sorted distinct-hash array itself instead
    * of collapsing to an estimate — the mergeable artifact that set
    * operations (union / intersection-below-theta, q100) compose on.
    * Same shuffle contract: ≤ k longs per (group, partition). */
  def sketchAgg(k: Int = 64): UserDefinedFunction =
    udaf(KmvSketch(k), Encoders.scalaLong)
}

/** [[KmvDistinct]] with the raw bottom-k array as the output — see
  * [[KmvDistinct.sketchAgg]]. */
case class KmvSketch(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  private val inner = KmvDistinct(k)
  override def zero: Array[Long] = inner.zero
  override def reduce(b: Array[Long], h: Long): Array[Long] =
    inner.reduce(b, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    inner.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
