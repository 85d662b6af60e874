package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** D3 upgrade path (SURVEY.md §2.11): the reference accumulates exact
  * distinct order-id sets in a HashSet inside its window reduce
  * (bean/ProductStats.java:74-84). `collect_set` + `size` covers the
  * declared queries; this typed Aggregator is the custom-aggregate form —
  * mergeable partial sets, usable over Datasets and registrable for SQL —
  * for when the set must not materialize as a column.
  * At true 100 TB cardinalities the drop-in replacement is
  * `approx_count_distinct` (HLL++), trading exactness for O(1) state.
  */
object DistinctCount extends Aggregator[Long, Set[Long], Long] {
  override def zero: Set[Long] = Set.empty
  override def reduce(b: Set[Long], a: Long): Set[Long] = b + a
  override def merge(b1: Set[Long], b2: Set[Long]): Set[Long] = b1 ++ b2
  override def finish(r: Set[Long]): Long = r.size.toLong
  override def bufferEncoder: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
