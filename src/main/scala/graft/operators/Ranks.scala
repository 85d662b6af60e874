package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact global ordering statistics at cluster scale — the distributed
  * sort-rank primitive and the reports built on it (equi-depth histograms,
  * exact medians / MAD robust outlier screens).
  *
  * The single-machine way to rank is `row_number() OVER (ORDER BY ...)`,
  * which Spark executes by moving EVERY row into one partition — the
  * single-reducer trap q89 documents for NTILE. The scale-correct
  * construction here is the Terasort pattern:
  *
  *   1. `repartitionByRange` on the full order key — each partition holds a
  *      contiguous key range, partition i's keys all ≤ partition i+1's
  *      (parallel sampling pass + one full shuffle, exactly what a global
  *      sort costs);
  *   2. rows get per-partition positions from `monotonically_increasing_id`
  *      after an in-partition sort (the id is `pid·2^33 + rowIndex`, so
  *      position-in-partition recovers by subtracting the per-(partition,
  *      group) MIN id — no second full-data shuffle for a window);
  *   3. per-(partition, group) counts aggregate to a METADATA-sized frame
  *      (≤ partitions × |groups| rows), a running sum over partition index
  *      turns them into start offsets, and the offsets broadcast back.
  *
  * Global rank = offset(partition, group) + position-in-partition. The
  * result is invariant to the (sampled) range boundaries because the order
  * key is required to be a TOTAL order — equal keys cannot exist, so every
  * row's rank is fixed by the data alone, and re-runs / different partition
  * counts hash identically (RanksSpec proves 4-vs-13-partition equality).
  */
object Ranks {

  /** Exact 1-based global row number within each group of `groupCols`,
    * ordered by `orderCols` — which the CALLER must make a total order
    * within every group (pass a unique key as the last column). With empty
    * `groupCols` this is a global rank over the whole frame. One full
    * shuffle (the range exchange), one metadata-sized aggregate, one
    * broadcast join — never a single-reducer window over the data.
    */
  def globalRowNumber(df: DataFrame, groupCols: Seq[String],
                      orderCols: Seq[String], out: String = "rnk",
                      partitions: Int = 0): DataFrame = {
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sortCols: Seq[Column] = (groupCols ++ orderCols).map(col)
    // localCheckpoint is CORRECTNESS-critical, not an optimization: the
    // offsets aggregate and the final join both consume this frame, and
    // without pinning one materialization they can evaluate the range
    // exchange independently — repartitionByRange seeds its boundary
    // sampling from the runtime RDD id, and the nondeterministic mono-id
    // in a chained-rank child defeats ReuseExchange's plan-equality check
    // — so the two branches can land rows in DIFFERENT partitions and the
    // broadcast offsets no longer describe the joined rows' __pid.
    // (Caught by the q123 chained ranks at sf0.01: per-brand Σd² drifted
    // only for groups straddling a re-sampled boundary.) Materializing
    // once is also the honest physical shape of a distributed sort-rank:
    // sort the runs once, then read them for both the count pass and the
    // rank pass.
    val ranged = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .transform(PinExplain.pinLazy)
    val gcols = groupCols.map(col)
    // one row per (partition, group): how many group-rows the partition
    // holds and where its id block starts — metadata scale
    val perPart = ranged.groupBy(col("__pid") +: gcols: _*)
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__base"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perPart
      .withColumn("__off", coalesce(sum(col("__cnt")).over(w), lit(0L)))
      .drop("__cnt")
    ranged
      .join(broadcast(offsets), "__pid" +: groupCols)
      .withColumn(out, col("__off") + (col("__mid") - col("__base")) + lit(1L))
      .drop("__pid", "__mid", "__base", "__off")
  }

  /** Exact running sum of `valueCol` over the (groupCols, orderCols)
    * total order — the distributed PREFIX-SCAN companion to
    * [[globalRowNumber]] (rank tells you WHERE a row sits; this tells you
    * how much mass precedes it — the primitive behind weighted medians,
    * cumulative-share reports, and packing cursors). Same skeleton: range
    * repartition, per-(partition, group) sums reduced to a metadata frame
    * whose running totals become start offsets, offsets broadcast back.
    * The in-partition prefix sum is a window over (partition, group) —
    * that exchange is p×|groups|-way parallel, never a single reducer,
    * and is the one extra shuffle a sum needs over a rank (positions fall
    * out of the sorted id block; sums genuinely need the scan). Same
    * localCheckpoint pin, same reason.
    */
  def globalRunningSum(df: DataFrame, groupCols: Seq[String],
                       orderCols: Seq[String], valueCol: String,
                       out: String = "cum", partitions: Int = 0): DataFrame =
    globalRunningSums(df, groupCols, orderCols, Seq(valueCol -> out),
      partitions)

  /** N exact running sums over ONE (groupCols, orderCols) total order —
    * the multi-measure form of [[globalRunningSum]]: one range exchange,
    * one pin, one per-(partition, group) offsets aggregate and one
    * in-partition prefix window carry EVERY measure together. Callers
    * needing two cumulative distributions over the same order (q139's KS
    * statistic) previously chained two full globalRunningSum passes —
    * re-ranging, re-pinning and re-sampling a frame that was already
    * range-sorted (guide §2.4: two operations keyed the same way share
    * one exchange). Identical per-measure results: the prefix sum of a
    * measure is a pure function of (frame, total order), not of how many
    * other measures ride the same scan. */
  def globalRunningSums(df: DataFrame, groupCols: Seq[String],
                        orderCols: Seq[String],
                        sums: Seq[(String, String)],
                        partitions: Int = 0): DataFrame = {
    require(sums.nonEmpty, "globalRunningSums needs at least one measure")
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sortCols: Seq[Column] = (groupCols ++ orderCols).map(col)
    val ranged = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(PinExplain.pinLazy)
    val gcols = groupCols.map(col)
    val aggCols = sums.zipWithIndex.map { case ((v, _), i) =>
      sum(col(v)).as(s"__s$i")
    }
    val perPart = ranged.groupBy(col("__pid") +: gcols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val w = Window.partitionBy(gcols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums.indices.foldLeft(perPart) { (d, i) =>
      d.withColumn(s"__off$i",
        coalesce(sum(col(s"__s$i")).over(w), lit(0L)))
    }.drop(sums.indices.map(i => s"__s$i"): _*)
    val wIn = Window.partitionBy(col("__pid") +: gcols: _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = ranged.join(broadcast(offsets), "__pid" +: groupCols)
    sums.zipWithIndex.foldLeft(joined) { case (d, ((v, out), i)) =>
      d.withColumn(out, col(s"__off$i") + sum(col(v)).over(wIn))
    }.drop("__pid" +: sums.indices.map(i => s"__off$i"): _*)
  }

  /** q126: exact weighted median — per return flag, the smallest line
    * price whose cumulative quantity reaches half the group's total
    * (lower weighted median under the (cents, orderkey, linenumber)
    * total order; the answer is an ELEMENT, the q120 no-interpolation
    * convention). The unweighted median says half the LINES are cheaper;
    * the weighted one says half the UNITS are — the version pricing and
    * capacity questions actually need. Cumulative mass comes from
    * [[globalRunningSum]]; the qualifying rows (2·cum ≥ total) form a
    * suffix of the order, so the median is one min-struct aggregate,
    * no second window. Integer cents × integer centi-units throughout.
    */
  def weightedMedian(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_returnflag"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
      expr("CAST(round(l_quantity) AS BIGINT)").as("w"),
      col("l_orderkey"), col("l_linenumber"))
    val tot = li.groupBy(col("l_returnflag"))
      .agg(sum(col("w")).as("tot_units"), count(lit(1)).as("n_lines"))
    globalRunningSum(li, Seq("l_returnflag"),
        Seq("cents", "l_orderkey", "l_linenumber"), "w", "cum_w")
      .join(broadcast(tot), Seq("l_returnflag"))
      .filter(lit(2L) * col("cum_w") >= col("tot_units"))
      .groupBy(col("l_returnflag"))
      .agg(min(struct(col("cents"), col("l_orderkey"),
        col("l_linenumber"))).as("m"),
        min(col("tot_units")).as("tot_units"),
        min(col("n_lines")).as("n_lines"))
      .select(col("l_returnflag"), col("m.cents").as("med_cents"),
        col("tot_units"), col("n_lines"))
      .orderBy(col("l_returnflag"))
  }

  /** DuckDB oracle for [[weightedMedian]]. */
  val weightedMedianSql: String =
    """WITH li AS (SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(round(l_quantity) AS BIGINT) AS w, l_orderkey, l_linenumber
      |  FROM lineitem),
      |t AS (SELECT l_returnflag, CAST(SUM(w) AS BIGINT) AS tot_units,
      |    CAST(COUNT(*) AS BIGINT) AS n_lines FROM li GROUP BY 1),
      |c AS (SELECT l_returnflag, cents, l_orderkey, l_linenumber,
      |    CAST(SUM(w) OVER (PARTITION BY l_returnflag
      |      ORDER BY cents, l_orderkey, l_linenumber
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w
      |  FROM li),
      |q AS (SELECT c.l_returnflag, cents,
      |    ROW_NUMBER() OVER (PARTITION BY c.l_returnflag
      |      ORDER BY cents, l_orderkey, l_linenumber) AS rn
      |  FROM c JOIN t USING (l_returnflag)
      |  WHERE 2 * cum_w >= tot_units)
      |SELECT q.l_returnflag, cents AS med_cents, tot_units, n_lines
      |FROM q JOIN t USING (l_returnflag)
      |WHERE rn = 1 ORDER BY 1""".stripMargin

  /** q118: exact equi-depth histogram of order values — K buckets of equal
    * row count (±1), with exact per-bucket bounds and mass. The equi-WIDTH
    * histogram (q88) shows shape but hides skew; equal-frequency bucket
    * bounds ARE the exact K-quantiles, the layout primitive behind range
    * partitioning, bucket pruning, and percentile reporting. Rank comes
    * from [[globalRowNumber]] (total order: value cents, then orderkey),
    * bucket = ⌊(rank−1)·K / N⌋ in pure integer arithmetic, and the bucket
    * reduce is an ordinary partial/final aggregate.
    */
  def equiDepthHistogram(s: SparkSession, dir: String,
                         k: Int = 16): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderkey"))
    val tot = o.agg(count(lit(1)).as("n_total"))
    globalRowNumber(o, Nil, Seq("cents", "o_orderkey"))
      .crossJoin(broadcast(tot))
      .select(col("cents"),
        expr(s"((rnk - 1) * $k) div n_total").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("bucket"))
  }

  /** DuckDB oracle for [[equiDepthHistogram]]. */
  def equiDepthHistogramSql(k: Int = 16): String =
    s"""WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       |    o_orderkey FROM orders),
       |r AS (SELECT cents,
       |    ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rnk FROM o),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM o)
       |SELECT ((rnk - 1) * $k) // n_total AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(cents) AS lo_cents, MAX(cents) AS hi_cents,
       |  CAST(SUM(cents) AS BIGINT) AS sum_cents
       |FROM r CROSS JOIN n
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q120: robust outlier screen — per event type, the exact median and
    * median absolute deviation (lower median at even counts: the value at
    * rank ⌊(n+1)/2⌋ under the (value, event_id) total order — an ELEMENT
    * of the data, so no interpolation and nothing to drift), flagging
    * events with |v − median| > 3·MAD. The q104 2σ screen breaks on the
    * heavy tails it is supposed to find (outliers inflate σ and mask
    * themselves); the MAD has a 50% breakdown point. Both median passes
    * rank distributively via [[globalRowNumber]] GROUPED by event type —
    * a group can span range partitions, so no per-group single task even
    * when one type dominates the stream. Integer cents end-to-end.
    */
  def robustOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events").select(
      col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v"),
      col("event_id"))
    val cnt = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val med = globalRowNumber(e, Seq("event_type"), Seq("v", "event_id"))
      .join(broadcast(cnt), Seq("event_type"))
      .filter(col("rnk") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("v").as("med"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = globalRowNumber(dev.select(col("event_type"), col("dev"),
        col("event_id")), Seq("event_type"), Seq("dev", "event_id"))
      .join(broadcast(cnt), Seq("event_type"))
      .filter(col("rnk") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("dev").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("med")).as("med_cents"),
        min(col("mad")).as("mad_cents"),
        sum(when(col("dev") > lit(3L) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        min(when(col("dev") > lit(3L) * col("mad"), col("v")))
          .as("min_out_cents"),
        max(when(col("dev") > lit(3L) * col("mad"), col("v")))
          .as("max_out_cents"))
      .orderBy(col("event_type"))
  }

  /** q123: Spearman rank correlation between part size and price, per
    * brand — the monotone-association screen (does bigger mean pricier,
    * and is the relationship brand-dependent?). Rank-based, so one
    * price outlier cannot swamp it the way it swamps Pearson (the q120
    * robustness argument applied to correlation).
    *
    * Both variables rank through [[globalRowNumber]] grouped by brand
    * under (value, partkey) total orders — the deterministic untying
    * convention (classic ρ assumes distinct ranks; with midranks you'd
    * switch to Pearson-on-ranks — documented, not needed for a
    * determinism-pinned report). ρ_ppm = 10⁶ − 6·10⁶·Σd² / (n(n²−1))
    * with the product widened through DECIMAL(38,0) before the integer
    * division (`div` lowers back to BIGINT): Σd² ≤ n³/3 puts the
    * numerator past Long around n ≈ 10⁵ rows per brand, far below the
    * decimal headroom. Two range shuffles + one brand aggregate. */
  def spearmanBrands(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select(col("p_brand"),
      col("p_size"),
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"),
      col("p_partkey"))
    val r1 = globalRowNumber(p, Seq("p_brand"),
      Seq("p_size", "p_partkey"), "r_size")
    val r2 = globalRowNumber(r1, Seq("p_brand"),
      Seq("cents", "p_partkey"), "r_price")
    r2.withColumn("d", col("r_size") - col("r_price"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("d") * col("d")).as("sum_d2"))
      .select(col("p_brand"), col("n"), col("sum_d2"),
        when(col("n") > 1, expr(
          """CAST(1000000 - (CAST(6000000 AS DECIMAL(38,0)) * sum_d2)
            |  div (CAST(n AS DECIMAL(38,0)) * (n * n - 1)) AS BIGINT)"""
            .stripMargin)).as("rho_ppm"))
      .orderBy(col("p_brand"))
  }

  /** q127: revenue-concentration audit — per nation, the exact Gini
    * coefficient of customer revenue and the top-decile revenue share,
    * both in integer ppm (the whale-curve / inequality report behind
    * "how concentrated is our revenue", and for a training corpus, "how
    * concentrated are our tokens per domain"). Gini uses the ranked-sum
    * identity G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over revenues sorted
    * ascending — ranks from [[globalRowNumber]] grouped by nation
    * (untied by custkey: revenues are an ELEMENT list, the determinism
    * convention), the i·x products and their sum widened through
    * DECIMAL(38,0) (i·x alone passes Long near 10⁷ customers × $10M;
    * decimal holds to 10³⁸), one integral division at the end. The
    * top-decile cut is a conditional sum in the SAME aggregate — rank >
    * n − n div 10 — so the whole report is the rank pass plus ONE
    * nation-keyed aggregate. */
  def revenueConcentration(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.load(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
    val cnt = rev.groupBy(col("n_name")).agg(count(lit(1)).as("n"))
    globalRowNumber(rev, Seq("n_name"), Seq("x", "c_custkey"), "i")
      .join(broadcast(cnt), Seq("n_name"))
      .groupBy(col("n_name"))
      .agg(min(col("n")).as("n_customers"),
        sum(col("x")).as("rev_cents"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * x")).as("six"),
        sum(when(col("i") > col("n") - expr("n div 10"), col("x"))
          .otherwise(0L)).as("top_rev"))
      .select(col("n_name"), col("n_customers"), col("rev_cents"),
        expr("""CAST((1000000 * (2 * six
          |  - (CAST(n_customers AS DECIMAL(38,0)) + 1) * rev_cents))
          |  div (CAST(n_customers AS DECIMAL(38,0)) * rev_cents)
          |  AS BIGINT)""".stripMargin).as("gini_ppm"),
        expr("top_rev * 1000000 div rev_cents").as("top_decile_ppm"))
      .orderBy(col("n_name"))
  }

  /** DuckDB oracle for [[revenueConcentration]]. */
  val revenueConcentrationSql: String =
    """WITH rev AS (SELECT n_name, c_custkey,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS x
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |r AS (SELECT n_name, x,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY n_name
      |      ORDER BY x, c_custkey) AS BIGINT) AS i
      |  FROM rev),
      |n AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n FROM rev
      |  GROUP BY 1),
      |a AS (SELECT r.n_name, MIN(n) AS n_customers,
      |    CAST(SUM(x) AS BIGINT) AS rev_cents,
      |    SUM(CAST(i AS HUGEINT) * x) AS six,
      |    CAST(SUM(CASE WHEN i > n - n // 10 THEN x ELSE 0 END) AS BIGINT)
      |      AS top_rev
      |  FROM r JOIN n USING (n_name) GROUP BY 1)
      |SELECT n_name, n_customers, rev_cents,
      |  CAST((1000000 * (2 * six
      |    - (CAST(n_customers AS HUGEINT) + 1) * rev_cents))
      |    // (CAST(n_customers AS HUGEINT) * rev_cents) AS BIGINT)
      |    AS gini_ppm,
      |  top_rev * 1000000 // rev_cents AS top_decile_ppm
      |FROM a ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[spearmanBrands]]. */
  val spearmanBrandsSql: String =
    """WITH p AS (SELECT p_brand, p_size,
      |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents, p_partkey
      |  FROM part),
      |r AS (SELECT p_brand,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand
      |      ORDER BY p_size, p_partkey) AS r_size,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand
      |      ORDER BY cents, p_partkey) AS r_price
      |  FROM p),
      |a AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM((r_size - r_price) * (r_size - r_price)) AS BIGINT)
      |      AS sum_d2
      |  FROM r GROUP BY 1)
      |SELECT p_brand, n, sum_d2,
      |  CASE WHEN n > 1 THEN CAST(1000000 -
      |    (CAST(6000000 AS HUGEINT) * sum_d2)
      |      // (CAST(n AS HUGEINT) * (n * n - 1)) AS BIGINT) END AS rho_ppm
      |FROM a ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[robustOutliers]]. */
  val robustOutliersSql: String =
    """WITH e AS (SELECT event_type,
      |    CAST(round(value * 100) AS BIGINT) AS v, event_id FROM events),
      |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM e
      |  GROUP BY 1),
      |r AS (SELECT event_type, v, ROW_NUMBER() OVER
      |    (PARTITION BY event_type ORDER BY v, event_id) AS rnk FROM e),
      |med AS (SELECT r.event_type, v AS med FROM r JOIN n USING (event_type)
      |  WHERE rnk = (n + 1) // 2),
      |d AS (SELECT e.event_type, e.v, ABS(e.v - med) AS dev, e.event_id,
      |    med FROM e JOIN med USING (event_type)),
      |dr AS (SELECT event_type, dev, ROW_NUMBER() OVER
      |    (PARTITION BY event_type ORDER BY dev, event_id) AS drnk FROM d),
      |mad AS (SELECT dr.event_type, dev AS madv FROM dr
      |  JOIN n USING (event_type) WHERE drnk = (n + 1) // 2)
      |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MIN(med) AS med_cents, MIN(madv) AS mad_cents,
      |  CAST(SUM(CASE WHEN dev > 3 * madv THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers,
      |  MIN(CASE WHEN dev > 3 * madv THEN d.v END) AS min_out_cents,
      |  MAX(CASE WHEN dev > 3 * madv THEN d.v END) AS max_out_cents
      |FROM d JOIN mad USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
