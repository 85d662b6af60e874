package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Deterministic bounded-state quantile sketch, the quantile twin of
  * [[KmvDistinct]]: keep the k DISTINCT values with the smallest
  * [[PortableHash.h60]] hashes per group (a uniform sample of the distinct-
  * value domain — bottom-k by a fixed hash IS a uniform sample, and a
  * deterministic one), then report exact index-quantiles OF THE SAMPLE.
  * Error behaves like a k-point uniform sample of the distinct values; for
  * groups with < k distinct values the quantiles are exact.
  *
  * Why not approx_percentile: its GK/KLL internals are engine-specific and
  * would downgrade the oracle to a tolerance check. This sketch is a pure
  * function of the data and the public h60 constants, so DuckDB re-derives
  * the SAME sample and the SAME quantiles — the gate stays rows+schema+hash
  * (same argument as q51/q52's KMV distinct).
  *
  * Scale design: true algebraic bounded-state aggregate — the buffer is a
  * (h, v)-sorted array of ≤ k pairs, merge is a capped sorted merge, so the
  * shuffle carries ≤ k pairs per (group, partition) regardless of group
  * size, and Spark plans it partial/final (ObjectHashAggregate), unlike an
  * exact percentile which shuffles every row to its group.
  *
  * Quantile convention (mirrored in SQL): sample values sorted ascending,
  * p-quantile = element at index (m-1)·p/100 (integer floor), m = sample
  * size — integer arithmetic only, no interpolation, engine-portable.
  */
case class KmvQuantile(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], (Long, Long, Long)] {
  require(k >= 2, s"KMV quantile needs k >= 2, got $k")

  override def zero: Array[(Long, Long)] = Array.empty

  // state is sorted by (h, v), distinct pairs, capped at k
  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def reduce(buf: Array[(Long, Long)],
                      in: (Long, Long)): Array[(Long, Long)] = {
    var ins = 0
    while (ins < buf.length && lt(buf(ins), in)) ins += 1
    if (ins < buf.length && buf(ins) == in) buf // duplicate pair: no-op
    else if (buf.length < k) {
      val out = new Array[(Long, Long)](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = in
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    } else if (ins < k) {
      val out = new Array[(Long, Long)](k)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = in
      System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
      out
    } else buf
  }

  override def merge(a: Array[(Long, Long)],
                     b: Array[(Long, Long)]): Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { j += 1; b(j - 1) }
        else if (j >= b.length) { i += 1; a(i - 1) }
        else if (lt(a(i), b(j))) { i += 1; a(i - 1) }
        else if (lt(b(j), a(i))) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) }
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[(Long, Long)]): (Long, Long, Long) = {
    if (buf.isEmpty) return (0L, 0L, 0L)
    val vs = buf.map(_._2).sorted
    val m = vs.length
    def q(p: Int): Long = vs(((m - 1) * p) / 100)
    (q(50), q(90), q(99))
  }

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
}

object KmvQuantile {
  /** Untyped two-column form: agg(hashCol, valueCol). hashCol must already
    * be [[PortableHash.h60]] of the value's canonical string form. */
  def columnAgg(k: Int = 64): UserDefinedFunction =
    udaf(KmvQuantile(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
}
