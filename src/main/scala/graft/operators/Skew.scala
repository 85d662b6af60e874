package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the 100 TB posture.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; these
  * helpers cover the aggregation side: a hot grouping key (a default value,
  * a null-ish sentinel, a celebrity entity) funnels its entire volume into
  * one reducer. Salting splits each hot group into `salts` sub-groups for
  * the partial aggregation, then combines — two shuffles of strictly
  * smaller volume instead of one stuck straggler task.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) partial, then
    * groupBy key final. `aggs` = (columnName, fn) with fn one of the
    * algebraic aggregates (sum/count/min/max) so partials re-combine. */
  def saltedAggregate(df: DataFrame, key: String, salts: Int,
                      aggs: Seq[(String, String)]): DataFrame = {
    // deterministic pseudo-random salt: spreads rows of one key across
    // `salts` partial groups without a random() (reproducible plans)
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val partialCols = aggs.zipWithIndex.map { case ((c, fn), i) =>
      expr(s"$fn($c)").as(s"_p$i")
    }
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(partialCols.head, partialCols.drop(1): _*)
    val finalCols = aggs.zipWithIndex.map { case ((_, fn), i) =>
      val refn = if (fn == "count") "sum" else fn // counts combine by sum
      expr(s"$refn(_p$i)").as(s"agg_$i")
    }
    partial.groupBy(col(key)).agg(finalCols.head, finalCols.drop(1): _*)
  }

  /** Declared q50: per-event-type traffic stats over `events` computed
    * through the SALTED two-phase plan. event_type is the canonical hot
    * key (5 distinct values over the whole fact table — at 100 TB a naive
    * groupBy funnels ~20 TB into each of 5 reducers); salting fans the
    * partial aggregation across `salts` sub-groups per key, then combines
    * the metadata-sized partials. Salting is semantics-neutral for
    * algebraic aggregates, so the DuckDB oracle is the PLAIN group-by —
    * the hash-compare proves the two-phase plan equals the naive one.
    * Sums stay decimal-exact through both phases (DECIMAL widening is
    * associative; a double two-phase sum would not hash-match). */
  def saltedEventStats(s: org.apache.spark.sql.SparkSession, dir: String,
                       salts: Int = 8): DataFrame =
    saltedAggregate(
      graft.Tables.load(s, dir, "events"), "event_type", salts,
      aggs = Seq(("1", "count"), ("CAST(value AS DECIMAL(18,2))", "sum")))
      .select(col("event_type"),
        col("agg_0").cast("long").as("pv_ct"),
        col("agg_1").cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  /** Salted broadcast join for a skewed fact⋈dim equi join: replicate the
    * (small) dim `salts` times, salt the fact side, join on (key, salt) —
    * splits a hot key's rows across `salts` tasks. With a broadcast dim
    * this is usually unnecessary (no shuffle at all); it exists for the
    * case where the dim is too big to broadcast but the fact is skewed. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
        saltedFact("_salt") === replicatedDim("_salt"))
      .drop("_salt")
  }

  /** q63: lineitem⋈part through the salted join, aggregated per p_type —
    * the oracle is the PLAIN join + group-by, so the gate hash-proves the
    * salting is semantics-neutral end-to-end (the q50 argument, applied to
    * the join operator). Salting spreads one hot fact key over `salts`
    * reducers; the dim side replicates `salts`× (dims are the small side
    * by definition — same asymmetry a broadcast join exploits, kept
    * shuffle-form here for dims too big to broadcast but small enough to
    * replicate). */
  def saltedPartRevenue(s: SparkSession, dir: String,
                        salts: Int = 8): DataFrame = {
    val li = graft.Tables.load(s, dir, "lineitem")
      .select(col("l_partkey"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
    val p = graft.Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_type"))
    saltedJoin(li, p, "l_partkey", "p_partkey", salts)
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("price")).cast("double").as("revenue"))
      .orderBy(col("p_type"))
  }
}
