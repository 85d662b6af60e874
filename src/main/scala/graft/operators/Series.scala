package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series repair and calendar analytics — the gap-fill / interval
  * family a reporting layer needs on top of the reference's per-day DWS
  * aggregates (gmall's sugar ADS charts assume a dense day axis the
  * DWS layer does not guarantee; reference GmvController.java renders a
  * day-keyed map straight into a chart axis).
  *
  * Scale design shared by the queries here:
  *  - corpus-sized work is always ONE partial/final day-keyed aggregate;
  *    the spine/window stages run over one row per day (metadata scale,
  *    q83's convention), so the unpartitioned ORDER BY day window is a
  *    few-thousand-row single task, not a fact-table sort;
  *  - all filled values are integer arithmetic (cents, counts, integer
  *    lerp with a positive numerator/denominator so `div` truncation is
  *    engine-portable) — no float interpolation that could diverge
  *    between engines or between partitionings.
  */
object Series {

  private val epoch = lit(java.sql.Date.valueOf("1970-01-01"))

  /** q96: daily gap-fill over a sparse series — the urgent/finished order
    * segment observes only ~1/3 of calendar days, so the dense day spine
    * (min..max observed) left-joins the observations and repairs holes
    * two ways: last-observation-carried-forward for the money column and
    * integer linear interpolation for the count column
    * (`(prev*(nextD-d) + next*(d-prevD)) div (nextD-prevD)` — numerator
    * and denominator both positive, so Spark's `div` and DuckDB's `//`
    * truncate identically).
    *
    * Spine bounds come from the observed min/max, so every hole has both
    * neighbors — LOCF/lerp never sees an open edge. */
  def gapFill(s: SparkSession, dir: String): DataFrame =
    gapFillFrom(gapFillObs(s, dir))

  /** The observed day aggregate feeding [[gapFillFrom]] — also the state
    * schema `streaming/SeriesStream.mergeDayBatch` maintains
    * incrementally (day partials merge by sum). */
  def gapFillObs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F")
      .groupBy(datediff(col("o_orderdate").cast("date"), epoch)
        .cast("long").as("d"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))

  /** Spine + repair stage over an observed (d, n, rev_cents) frame. */
  def gapFillFrom(obs: DataFrame): DataFrame = {
    // 1-row bounds frame -> dense spine (a few thousand rows at any SF)
    val spine = obs.agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("d"))

    val w = Window.orderBy(col("d"))
    val pre = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val post = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsD = when(col("n").isNotNull, col("d"))

    spine.join(obs, Seq("d"), "left")
      .withColumn("pn", last(col("n"), ignoreNulls = true).over(pre))
      .withColumn("pd", last(obsD, ignoreNulls = true).over(pre))
      .withColumn("nn", first(col("n"), ignoreNulls = true).over(post))
      .withColumn("nd", first(obsD, ignoreNulls = true).over(post))
      .withColumn("locf",
        last(col("rev_cents"), ignoreNulls = true).over(pre))
      .select(
        date_format(date_add(epoch, col("d").cast("int")), "yyyy-MM-dd")
          .as("day"),
        when(col("n").isNotNull, 1L).otherwise(0L).as("is_obs"),
        coalesce(col("n"),
          expr("(pn * (nd - d) + nn * (d - pd)) div (nd - pd)"))
          .as("n_filled"),
        col("locf").as("rev_locf_cents"))
      .orderBy(col("day"))
  }

  /** DuckDB oracle for [[gapFill]]. */
  val gapFillSql: String =
    """WITH obs AS (
      |  SELECT datediff('day', DATE '1970-01-01', o_orderdate) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM orders
      |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
      |  GROUP BY 1),
      |spine AS (SELECT unnest(generate_series(mn, mx)) AS d
      |  FROM (SELECT min(d) AS mn, max(d) AS mx FROM obs)),
      |j AS (SELECT s.d, o.n, o.rev_cents
      |  FROM spine s LEFT JOIN obs o USING (d)),
      |f AS (SELECT d, n, rev_cents,
      |    last_value(n IGNORE NULLS) OVER pre AS pn,
      |    last_value(CASE WHEN n IS NOT NULL THEN d END IGNORE NULLS)
      |      OVER pre AS pd,
      |    first_value(n IGNORE NULLS) OVER post AS nn,
      |    first_value(CASE WHEN n IS NOT NULL THEN d END IGNORE NULLS)
      |      OVER post AS nd,
      |    last_value(rev_cents IGNORE NULLS) OVER pre AS locf
      |  FROM j
      |  WINDOW pre AS (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    post AS (ORDER BY d
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT strftime(DATE '1970-01-01' + CAST(d AS INT), '%Y-%m-%d')
      |    AS day,
      |  CAST(CASE WHEN n IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_obs,
      |  COALESCE(n, (pn * (nd - d) + nn * (d - pd)) // (nd - pd))
      |    AS n_filled,
      |  locf AS rev_locf_cents
      |FROM f ORDER BY day""".stripMargin

  /** Derived interval per event: [ts, ts + (event_id % 300 + 30) s) in
    * microseconds — a deterministic pure function of the data, standing in
    * for a session/lease/validity duration column. */
  private def eventIntervals(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("user_id"), expr("ts div 1000").as("st"), col("event_id"))
      .withColumn("en",
        col("st") + (col("event_id") % 300 + 30) * lit(1000000L))

  /** q97: coalesce overlapping intervals per user (gaps-and-islands with a
    * running max end): an interval starts a new island iff its start lies
    * strictly after every earlier interval's end, i.e. touching intervals
    * merge. The classic normalizer for leases / sessions-with-duration /
    * SCD validity ranges (the q71 history family produces exactly such
    * interval sets).
    *
    * Scale: ONE shuffle on user_id; both windows and the island reduce run
    * inside that partitioning (no second exchange — the island key extends
    * the partition key). Per-user interval counts are bounded by per-user
    * activity, the same skew profile every user-keyed operator here has. */
  def intervalMerge(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("st"), col("en"), col("event_id"))
    val prevMax = max(col("en"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    eventIntervals(s, dir)
      .withColumn("new_island",
        when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("st")).as("start_us"), max(col("en")).as("end_us"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("island"))
  }

  /** DuckDB oracle for [[intervalMerge]]. */
  val intervalMergeSql: String =
    """WITH iv AS (SELECT user_id, epoch_us(ts) AS st, event_id,
      |    epoch_us(ts) + (event_id % 300 + 30) * 1000000 AS en
      |  FROM events),
      |fl AS (SELECT user_id, st, en, event_id,
      |    CASE WHEN max(en) OVER (PARTITION BY user_id
      |        ORDER BY st, en, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR st > max(en) OVER (PARTITION BY user_id
      |        ORDER BY st, en, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_island
      |  FROM iv),
      |isl AS (SELECT user_id, st, en,
      |    SUM(new_island) OVER (PARTITION BY user_id
      |      ORDER BY st, en, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM fl)
      |SELECT user_id, CAST(island AS BIGINT) AS island,
      |  MIN(st) AS start_us, MAX(en) AS end_us,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM isl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q102: month-over-month and year-over-year revenue deltas — the
    * calendar-comparison report every ADS GMV chart grows into
    * (reference serves single-day GMV; this is its period-comparison
    * extension). The comparison windows are RANGE frames over the month
    * INDEX (year*12+month), not ROWS frames, so a missing month yields
    * NULL deltas instead of silently comparing against the wrong month.
    *
    * Scale: the fact table reduces to one row per month in a single
    * partial/final aggregate; the windows run over ~tens of rows. */
  def monthlyDeltas(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.load(s, dir, "orders")
      .groupBy(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("midx"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("rev_cents"),
        count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("midx"))
    val prev1 = max(col("rev_cents")).over(w.rangeBetween(-1, -1))
    val prev12 = max(col("rev_cents")).over(w.rangeBetween(-12, -12))
    monthly
      .select(col("month"), col("rev_cents"), col("n_orders"),
        (col("rev_cents") - prev1).as("mom_delta_cents"),
        (col("rev_cents") - prev12).as("yoy_delta_cents"))
      .orderBy(col("month"))
  }

  /** q114: trailing-window volume anomaly screen — each day's event count
    * tested against the mean/variance of the PRECEDING seven calendar
    * days (the alerting panel a DWS layer drives: "is today's traffic
    * off-trend?"). Composes q83's RANGE-frame convention (the trailing
    * frame is over the day INDEX, so calendar gaps shrink the sample
    * instead of silently pulling in stale days) with q104's exact z-test:
    * `|x − μ| > 2σ  ⇔  (m·x − s)² > 4·(m·ssq − s²)` cross-multiplied into
    * DECIMAL(38,0)/HUGEINT — no float mean or variance anywhere, so the
    * flag is a pure function of the data at any partitioning. Days with
    * fewer than three trailing observations report a NULL flag (not
    * false): an alert from a 1-2 day baseline is noise, and the NULL
    * makes the warm-up visible to the consumer.
    *
    * Scale: the corpus-sized work is one day-keyed partial/final
    * aggregate; the trailing window runs over ONE ROW PER DAY (metadata
    * scale, q83's argument), so the unpartitioned ORDER BY window is a
    * few-thousand-row single task even at 100 TB. */
  def anomalyDays(s: SparkSession, dir: String): DataFrame =
    anomalyDaysFrom(Tables.load(s, dir, "events")
      .select(expr("ts div 86400000000000").as("day_num"),
        expr("ts div 1000000000").as("sec"))
      .groupBy(col("day_num"))
      .agg(min(date_format(timestamp_seconds(col("sec")), "yyyy-MM-dd"))
          .as("day"),
        count(lit(1)).as("n_events")))

  /** The anomaly report stage over an already-reduced daily frame
    * (day_num, day, n_events) — shared with the incremental twin (the
    * maintained state of `streaming/RollingStream` IS that frame, so the
    * streamed report equals the batch one structurally). */
  def anomalyDaysFrom(daily: DataFrame): DataFrame = {
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val w = Window.orderBy(col("day_num")).rangeBetween(-7, -1)
    daily
      .withColumn("t_days", count(lit(1)).over(w))
      .withColumn("t_sum", sum(col("n_events")).over(w))
      .withColumn("t_ssq",
        sum(big(col("n_events")) * big(col("n_events"))).over(w))
      .withColumn("is_anomaly",
        when(col("t_days") < 3, lit(null).cast("boolean")).otherwise(
          (big(col("t_days")) * big(col("n_events")) - big(col("t_sum"))) *
          (big(col("t_days")) * big(col("n_events")) - big(col("t_sum"))) >
          lit(4) * (big(col("t_days")) * col("t_ssq") -
            big(col("t_sum")) * big(col("t_sum")))))
      .select(col("day"), col("n_events"), col("t_days"),
        coalesce(col("t_sum"), lit(0L)).as("t_events"), col("is_anomaly"))
      .orderBy(col("day"))
  }

  /** DuckDB oracle for [[anomalyDays]]. */
  val anomalyDaysSql: String =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day_num,
      |    MIN(strftime(ts, '%Y-%m-%d')) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT day, n_events,
      |    CAST(COUNT(*) OVER wt AS BIGINT) AS t_days,
      |    CAST(SUM(n_events) OVER wt AS BIGINT) AS t_sum,
      |    SUM(CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT))
      |      OVER wt AS t_ssq
      |  FROM daily
      |  WINDOW wt AS (ORDER BY day_num
      |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT day, n_events, t_days,
      |  COALESCE(t_sum, 0) AS t_events,
      |  CASE WHEN t_days < 3 THEN NULL
      |    ELSE (CAST(t_days AS HUGEINT) * n_events - t_sum)
      |       * (CAST(t_days AS HUGEINT) * n_events - t_sum)
      |       > 4 * (CAST(t_days AS HUGEINT) * t_ssq
      |         - CAST(t_sum AS HUGEINT) * CAST(t_sum AS HUGEINT))
      |  END AS is_anomaly
      |FROM t ORDER BY day""".stripMargin

  /** q124: change-point detection on the daily revenue series — the top-5
    * candidate break days by the binary-segmentation CUSUM statistic
    * C_d = |n·S_d − d·S_n| (S = revenue prefix sum, d = day rank), the
    * maximization that finds WHERE a series' mean shifts (regime change,
    * pipeline breakage, pricing event). The q114 trailing-window screen
    * flags local spikes; this finds the global structural break.
    *
    * The statistic is the exact-integer cross-multiplication of
    * |S_d/d − (S_n−S_d)/(n−d)|-style mean splits (the q104 convention:
    * no float means, no drift; n·S stays far below Long past 10⁴ days ×
    * 10¹³ total cents). Corpus-sized work is ONE day-keyed partial/final
    * aggregate; the prefix sums, ranks, and the top-k run on the
    * metadata-scale day frame (q83's convention), with the final cut an
    * orderBy+limit → TakeOrderedAndProject. The last day is excluded
    * (no right segment to split off). */
  def changePoints(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    changePointsFrom(
      Tables.load(s, dir, "orders")
        .groupBy(datediff(col("o_orderdate").cast("date"),
            lit(java.sql.Date.valueOf("1970-01-01"))).cast("long")
            .as("day_idx"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("rev_cents")), k)

  /** The statistic/report stage over an already-reduced daily frame
    * (day_idx, day, rev_cents) — shared with the incremental twin: the
    * maintained day-partials state (sums merge exactly across
    * micro-batches) IS that frame, so the streamed report equals the
    * batch one structurally (the q83/q96 convention). */
  def changePointsFrom(daily: DataFrame, k: Int = 5): DataFrame = {
    val wOrd = Window.orderBy(col("day_idx"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(count(lit(1)).as("n_days"),
      sum(col("rev_cents")).as("s_total"))
    daily
      .withColumn("d_rank", row_number().over(wOrd).cast("long"))
      .withColumn("s_prefix", sum(col("rev_cents")).over(wCum))
      .crossJoin(broadcast(tot))
      .filter(col("d_rank") < col("n_days"))
      .select(col("day"), col("d_rank"), col("s_prefix"),
        abs(col("n_days") * col("s_prefix") - col("d_rank") * col("s_total"))
          .as("cusum_stat"),
        expr("s_prefix div d_rank").as("mean_before_cents"),
        expr("(s_total - s_prefix) div (n_days - d_rank)")
          .as("mean_after_cents"))
      .orderBy(col("cusum_stat").desc, col("day"))
      .limit(k)
  }

  /** DuckDB oracle for [[changePoints]]. */
  def changePointsSql(k: Int = 5): String =
    s"""WITH daily AS (SELECT
       |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
       |      AS day_idx,
       |    strftime(o_orderdate, '%Y-%m-%d') AS day,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS rev_cents
       |  FROM orders GROUP BY 1, 2),
       |r AS (SELECT day,
       |    CAST(ROW_NUMBER() OVER (ORDER BY day_idx) AS BIGINT) AS d_rank,
       |    CAST(SUM(rev_cents) OVER (ORDER BY day_idx
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_prefix
       |  FROM daily),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(SUM(rev_cents) AS BIGINT) AS s_total FROM daily)
       |SELECT day, d_rank, s_prefix,
       |  ABS(n_days * s_prefix - d_rank * s_total) AS cusum_stat,
       |  s_prefix // d_rank AS mean_before_cents,
       |  (s_total - s_prefix) // (n_days - d_rank) AS mean_after_cents
       |FROM r CROSS JOIN t
       |WHERE d_rank < n_days
       |ORDER BY cusum_stat DESC, day LIMIT $k""".stripMargin

  /** DuckDB oracle for [[monthlyDeltas]]. */
  val monthlyDeltasSql: String =
    """WITH m AS (
      |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
      |      AS BIGINT) AS midx,
      |    strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1, 2)
      |SELECT month, rev_cents, n_orders,
      |  rev_cents - max(rev_cents) OVER (ORDER BY midx
      |    RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS mom_delta_cents,
      |  rev_cents - max(rev_cents) OVER (ORDER BY midx
      |    RANGE BETWEEN 12 PRECEDING AND 12 PRECEDING) AS yoy_delta_cents
      |FROM m ORDER BY month""".stripMargin
}
