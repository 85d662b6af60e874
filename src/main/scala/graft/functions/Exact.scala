package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic, oracle-exact numeric helpers.
  *
  * Double summation is order-dependent, so a distributed Spark sum and a
  * single-threaded DuckDB sum of the same doubles can differ in the last ULP
  * and fail a hash compare. The driver data's money-like columns are exact
  * 2-decimal values stored as doubles (verified against the testdata), so we
  * cast to DECIMAL before summing: decimal addition is exact and associative,
  * giving bitwise-identical results regardless of partitioning/parallelism —
  * the property that makes the same query hash-stable from local[32] up to a
  * 1000-executor cluster.
  *
  * Reference analogue: the reference keeps money in BigDecimal end-to-end
  * (gmall-realtime bean/OrderInfo.java:21-26, bean/ProductStats.java:33).
  *
  * FOURTH-DECADE RULE for the final decimal→double cast (found by the r13
  * sfx1 gate on q01's sum_charge): once |sum| × 10^scale exceeds 2^53, the
  * decimal is not exactly representable and the two engines' conversions
  * diverge by 1 ULP — Spark's `Decimal.toDouble` single-rounds via
  * BigDecimal.doubleValue, while DuckDB's direct `CAST(dec AS DOUBLE)`
  * double-rounds (hugeint→double, then ÷10^scale). The ORACLE side must
  * then route through VARCHAR — `CAST(CAST(SUM(...) AS VARCHAR) AS
  * DOUBLE)` — which is correctly rounded and bit-matches Spark (verified
  * on all six q01 groups at sfx1). Scale-2 sums have headroom to ~9e13,
  * scale-4 to ~9e11, scale-6 to ~9e9 before the rule bites.
  */
object Exact {
  /** Cast a 2-decimal-valued double to exact decimal (scale covers products
    * of two/three such values at scale 4/6). */
  def money(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** Exact associative sum of money-like doubles, emitted back as double. */
  def exactSum(c: Column, scale: Int = 2): Column =
    sum(money(c, scale)).cast("double")

  /** Deterministic average: exact decimal sum divided by count, in double. */
  def exactAvg(c: Column, scale: Int = 2): Column =
    sum(money(c, scale)).cast("double") / count(c).cast("double")
}
