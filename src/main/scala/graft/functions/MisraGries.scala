package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch (Misra & Gries 1982) — the
  * bounded-state answer to "which keys exceed 1/k of the stream?" that a
  * plain groupBy cannot give at 100 TB when the key space itself is huge
  * (tokens, n-grams, URLs, domains): the full count table is
  * vocabulary-sized, the MG summary is O(k) per partition FOREVER.
  *
  * Guarantee: with `k-1` counters, every item whose true frequency
  * exceeds N/k has a non-zero counter (each decrement round removes k
  * distinct occurrences, so at most N/k decrements can hit one item).
  * Merging partial summaries preserves the bound (Agarwal et al. 2013,
  * "Mergeable Summaries": pointwise-sum the counters, subtract the
  * (k)-th largest count, drop non-positives — per-part errors ADD to
  * ≤ N1/k + N2/k = N/k), so Spark's map-side partial aggregation and
  * shuffle merge tree are safe: the driver-side summary is a guaranteed
  * SUPERSET of the true heavy hitters regardless of partitioning.
  *
  * The sketch yields CANDIDATES, not counts — counter values depend on
  * arrival/merge order. Consumers (q116) therefore run the standard
  * two-pass protocol: MG candidates, then one exact counting pass
  * restricted to the ≤ k-1 broadcast candidates, then the exact
  * `n·k > N` filter — making the OUTPUT a pure function of the data,
  * bit-identical to the DuckDB oracle's full GROUP BY, while the
  * full-vocabulary count table never materializes.
  */
case class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {
  require(k >= 2, s"MisraGries needs k >= 2, got $k")
  private val cap = k - 1

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c)                  => buf.updated(x, c + 1)
      case None if buf.size < cap   => buf.updated(x, 1L)
      case None =>
        // decrement-all: the incoming item's single occurrence and one
        // occurrence of each tracked item cancel (k distinct items drop)
        buf.collect { case (w, c) if c > 1 => w -> (c - 1) }
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (sum.size <= cap) sum
    else {
      // subtract the (cap+1)-th largest count; ≤ cap items can exceed it
      val kth = sum.valuesIterator.toArray
        .sorted(Ordering[Long].reverse).apply(cap)
      sum.collect { case (w, c) if c > kth => w -> (c - kth) }
    }
  }

  /** Sorted candidate keys — deterministic ORDER, data-dependent SET
    * (any superset of the true heavy hitters is valid output). */
  override def finish(buf: Map[String, Long]): Array[String] =
    buf.keysIterator.toArray.sorted

  override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
