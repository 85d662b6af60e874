package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash

/** Statistical curation/reporting operators: deterministic weighted
  * sampling, moment-based outlier audits, and share-of-total reporting.
  * All three follow the repo's exactness doctrine — selection predicates
  * and scores are integer/decimal arithmetic computable bit-identically
  * by the DuckDB oracle, and no operator materializes more than one
  * corpus pass.
  */
object Stats {

  /** q103: weight-proportional deterministic Bernoulli sample — every doc
    * is kept with probability w/32 where w ∈ 1..8 is a length-derived
    * quality weight, via the pure-integer predicate
    * `h60(doc_id) < w · 2^55` (w·2^55 ≤ 2^58 « Long.MaxValue, and
    * h60 is uniform on [0, 2^60)). The q57 stratified sampler hits an
    * EXACT per-stratum quota; this is its expected-rate sibling — no
    * per-stratum count pass at all, one corpus scan, embarrassingly
    * parallel, and stable under re-runs/appends because membership is a
    * pure function of doc_id (the property training-data pipelines need
    * for reproducible corpus releases).
    *
    * Output is the per-(lang, w) audit: population, sampled count, and
    * achieved ppm vs the w/32 target — the report a curation team reads
    * to confirm the sampler is unbiased. */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    val w8 = least(lit(8L), greatest(lit(1L), expr("n_chars div 64")))
    Tables.load(s, dir, "documents")
      .select(col("lang"), col("n_chars"), col("doc_id"),
        w8.as("w"),
        PortableHash.h60(col("doc_id").cast("string")).as("h"))
      .withColumn("kept",
        when(col("h") < col("w") * lit(1L << 55), 1L).otherwise(0L))
      .groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_sampled"))
      .withColumn("achieved_ppm",
        expr("n_sampled * 1000000 div n_docs"))
      .withColumn("target_ppm", expr("w * 1000000 div 32"))
      .orderBy(col("lang"), col("w"))
  }

  /** DuckDB oracle for [[weightedSample]]. */
  val weightedSampleSql: String = {
    val h = PortableHash.h60Sql("CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (SELECT lang,
       |    least(8, greatest(1, n_chars // 64)) AS w,
       |    CASE WHEN $h < least(8, greatest(1, n_chars // 64))
       |        * ${1L << 55} THEN 1 ELSE 0 END AS kept
       |  FROM documents)
       |SELECT lang, CAST(w AS BIGINT) AS w,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(kept) AS BIGINT) AS n_sampled,
       |  CAST(SUM(kept) AS BIGINT) * 1000000 // COUNT(*) AS achieved_ppm,
       |  CAST(w AS BIGINT) * 1000000 // 32 AS target_ppm
       |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** q104: moment-based 2σ outlier audit per event type — the data-quality
    * screen run before a metric column feeds training or reporting. The
    * z-score test is cross-multiplied into EXACT integer arithmetic:
    * `|x − μ| > 2σ  ⇔  (n·x − sum)² > 4·(n·sumsq − sum²)`, evaluated in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so there is no float mean,
    * no float variance, and no rounding anywhere — the flag is a pure
    * function of the data at any partitioning. One corpus pass computes
    * the moments (plain partial/final aggregate), the per-row test joins
    * the 5-row moment frame back by broadcast. */
  def outlierAudit(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val moments = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(big(col("v")) * big(col("v"))).as("svv"))
    ev.join(broadcast(moments), Seq("event_type"))
      .withColumn("lhs",
        (big(col("n")) * big(col("v")) - big(col("sv"))) *
        (big(col("n")) * big(col("v")) - big(col("sv"))))
      .withColumn("rhs",
        lit(4) * (big(col("n")) * col("svv") - big(col("sv")) * big(col("sv"))))
      .withColumn("is_out", when(col("lhs") > col("rhs"), 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("is_out")).as("n_outliers"),
        min(when(col("is_out") === 1L, col("v"))).as("min_out_cents"),
        max(when(col("is_out") === 1L, col("v"))).as("max_out_cents"))
      .orderBy(col("event_type"))
  }

  /** DuckDB oracle for [[outlierAudit]]. */
  val outlierAuditSql: String =
    """WITH e AS (SELECT event_type,
      |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
      |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(v) AS BIGINT) AS sv,
      |    CAST(SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS HUGEINT)
      |      AS svv
      |  FROM e GROUP BY 1),
      |t AS (SELECT e.event_type, e.v,
      |    CASE WHEN (CAST(n AS HUGEINT) * v - sv)
      |           * (CAST(n AS HUGEINT) * v - sv)
      |         > 4 * (CAST(n AS HUGEINT) * svv
      |           - CAST(sv AS HUGEINT) * CAST(sv AS HUGEINT))
      |      THEN 1 ELSE 0 END AS is_out
      |  FROM e JOIN m USING (event_type))
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(is_out) AS BIGINT) AS n_outliers,
      |  MIN(CASE WHEN is_out = 1 THEN v END) AS min_out_cents,
      |  MAX(CASE WHEN is_out = 1 THEN v END) AS max_out_cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** q105: share-of-total reporting — each nation's revenue as ppm of its
    * region's and of the grand total, the ratio_to_report/percent-of-total
    * OLAP pattern. The fact table reduces once to (region, nation) rows;
    * the region and grand totals are WINDOW sums over that reduced frame
    * (25 rows — metadata scale), never second scans. Shares are integer
    * ppm (exact decimal cents cross-divided), so the report hashes
    * identically at any parallelism. */
  def revenueShare(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.load(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.load(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .as("rev_cents"))
    val byRegion = Window.partitionBy(col("r_name"))
    val overall = Window.partitionBy()
    // ppm numerators stay in Long: rev_cents·10^6 overflows only past
    // ~9·10^12 total cents (≈ $90B) per window — far beyond the measured
    // SFs; past that boundary both engines switch to DECIMAL/HUGEINT the
    // q104 way (and DuckDB would error loudly, not wrap)
    base
      .withColumn("region_rev", sum(col("rev_cents")).over(byRegion))
      .withColumn("total_rev", sum(col("rev_cents")).over(overall))
      .select(col("r_name"), col("n_name"), col("rev_cents"),
        expr("rev_cents * 1000000 div region_rev").as("region_share_ppm"),
        expr("rev_cents * 1000000 div total_rev").as("total_share_ppm"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** q106: join fan-out audit — the data-quality screen for the
    * MULTIPLICITY side of referential integrity (q77 catches orphans;
    * this catches the exploding-join side): per relation, the log2
    * histogram of children-per-parent-key, with exact min/max per bucket
    * to pin the tail. A fact joined through a key whose fan-out
    * histogram has a long tail is the row-explosion / skew hazard every
    * scale-up postmortem starts with — this is the report you read
    * BEFORE shipping the join.
    *
    * One aggregate per relation (key-count then bucket-count, both
    * partial/final); log2 bucket via LENGTH(bin(x))-1, pure integer
    * (q88's convention). */
  def fanoutAudit(s: SparkSession, dir: String): DataFrame = {
    def hist(df: DataFrame, key: String, rel: String): DataFrame =
      df.groupBy(col(key)).agg(count(lit(1)).as("fo"))
        .select((length(bin(col("fo"))) - 1).cast("long").as("bucket"),
          col("fo"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_keys"), min(col("fo")).as("min_fanout"),
          max(col("fo")).as("max_fanout"))
        .withColumn("relation", lit(rel))
    hist(Tables.load(s, dir, "lineitem"), "l_orderkey",
        "lineitem_per_order")
      .unionByName(hist(Tables.load(s, dir, "orders"), "o_custkey",
        "orders_per_customer"))
      .unionByName(hist(Tables.load(s, dir, "lineitem"), "l_partkey",
        "lineitem_per_part"))
      .select(col("relation"), col("bucket"), col("n_keys"),
        col("min_fanout"), col("max_fanout"))
      .orderBy(col("relation"), col("bucket"))
  }

  /** DuckDB oracle for [[fanoutAudit]]. */
  val fanoutAuditSql: String = {
    def hist(table: String, key: String, rel: String): String =
      s"""SELECT '$rel' AS relation,
         |  CAST(LENGTH(bin(fo)) - 1 AS BIGINT) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  MIN(fo) AS min_fanout, MAX(fo) AS max_fanout
         |FROM (SELECT $key, CAST(COUNT(*) AS BIGINT) AS fo FROM $table
         |  GROUP BY 1) GROUP BY 1, 2""".stripMargin
    hist("lineitem", "l_orderkey", "lineitem_per_order") +
      "\nUNION ALL\n" +
      hist("orders", "o_custkey", "orders_per_customer") +
      "\nUNION ALL\n" +
      hist("lineitem", "l_partkey", "lineitem_per_part") +
      "\nORDER BY relation, bucket"
  }

  /** q107: grouped string aggregation — top-3 parts per brand by revenue,
    * concatenated in rank order (the LISTAGG/string_agg report surface).
    * Two determinism traps are closed: collect_list order is
    * partition-dependent (sorted structs fix it) and revenue ties would
    * make rank 3 arbitrary (p_name tiebreak makes the string a pure
    * function of the data). Scale shape: rank 3 is cut by a brand-
    * PARTITIONED window (WindowGroupLimit pushes the limit into the
    * partial sort) BEFORE any list materializes, so the collected list
    * is ≤ 3 structs per brand no matter how many parts a brand has —
    * never listagg-then-truncate. */
  def topPartsConcat(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val part = Tables.load(s, dir, "part")
    val pr = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_name"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("rev_cents"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("rev_cents").desc, col("p_name"))
    val top = pr.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .groupBy(col("p_brand"))
      .agg(collect_list(struct(col("rk"), col("p_name"))).as("xs"))
      .select(col("p_brand"),
        expr("array_join(transform(array_sort(xs), x -> x.p_name), ',')")
          .as("top_parts"))
    val counts = pr.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
    top.join(counts, Seq("p_brand"))
      .select(col("p_brand"), col("top_parts"), col("n_parts"))
      .orderBy(col("p_brand"))
  }

  /** DuckDB oracle for [[topPartsConcat]]. */
  val topPartsConcatSql: String =
    """WITH pr AS (SELECT p_brand, p_name,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev_cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |r AS (SELECT p_brand, p_name, rev_cents,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY rev_cents DESC, p_name) AS rk
      |  FROM pr)
      |SELECT p_brand,
      |  string_agg(CASE WHEN rk <= 3 THEN p_name END, ','
      |    ORDER BY rk) AS top_parts,
      |  CAST(COUNT(*) AS BIGINT) AS n_parts
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** q108: cumulative reach — running count of DISTINCT users ever seen,
    * by day. The naive form (COUNT(DISTINCT) over a growing window)
    * re-scans every prefix; the scalable identity is
    * `cum_distinct(d) = #{users whose FIRST day ≤ d}` — ONE user-keyed
    * min pass over the corpus, then a day-grain spine + running sum at
    * metadata scale (q96's convention). Daily actives ride the same
    * scan. */
  def cumulativeReach(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("d"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("d")).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("n_new"))
    val active = ev.distinct().groupBy(col("d"))
      .agg(count(lit(1)).as("n_active"))
    val spine = ev.agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("d"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(firstDay.withColumnRenamed("f", "d"), Seq("d"), "left")
      .join(active, Seq("d"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("n_active", coalesce(col("n_active"), lit(0L)))
      .withColumn("cum_reach", sum(col("n_new")).over(w))
      .select(col("d"), col("n_new"), col("n_active"), col("cum_reach"))
      .orderBy(col("d"))
  }

  /** DuckDB oracle for [[cumulativeReach]]. */
  val cumulativeReachSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS d
      |  FROM events),
      |fd AS (SELECT f AS d, CAST(COUNT(*) AS BIGINT) AS n_new
      |  FROM (SELECT user_id, MIN(d) AS f FROM e GROUP BY 1) GROUP BY 1),
      |ac AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_active
      |  FROM (SELECT DISTINCT user_id, d FROM e) GROUP BY 1),
      |spine AS (SELECT unnest(generate_series(mn, mx)) AS d
      |  FROM (SELECT MIN(d) AS mn, MAX(d) AS mx FROM e))
      |SELECT s.d, COALESCE(fd.n_new, 0) AS n_new,
      |  COALESCE(ac.n_active, 0) AS n_active,
      |  CAST(SUM(COALESCE(fd.n_new, 0)) OVER (ORDER BY s.d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_reach
      |FROM spine s
      |LEFT JOIN fd ON fd.d = s.d
      |LEFT JOIN ac ON ac.d = s.d
      |ORDER BY s.d""".stripMargin

  /** q109: set-operation audit — customers with orders in 1995 vs 1996
    * classified into both / only-1995 / only-1996, expressed with the
    * DataFrame `intersect` / `except` operators themselves (the declared
    * surface should exercise Spark's set-op planning — they lower to
    * distinct-preserving semi/anti joins, shuffling each side once on
    * the full row as key). */
  def yearCohortSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    def custs(year: Int) =
      o.filter(expr(s"year(o_orderdate) = $year"))
        .select(col("o_custkey")).distinct()
    val a = custs(1995)
    val b = custs(1996)
    def counted(df: DataFrame, label: String) =
      df.agg(count(lit(1)).as("n_customers"))
        .withColumn("cohort", lit(label))
    counted(a.intersect(b), "both")
      .unionByName(counted(a.except(b), "only_1995"))
      .unionByName(counted(b.except(a), "only_1996"))
      .select(col("cohort"), col("n_customers"))
      .orderBy(col("cohort"))
  }

  /** DuckDB oracle for [[yearCohortSetOps]]. */
  val yearCohortSetOpsSql: String =
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders
      |  WHERE year(o_orderdate) = 1995),
      |b AS (SELECT DISTINCT o_custkey FROM orders
      |  WHERE year(o_orderdate) = 1996)
      |SELECT 'both' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
      |  FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      |UNION ALL
      |SELECT 'only_1995', CAST(COUNT(*) AS BIGINT)
      |  FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      |UNION ALL
      |SELECT 'only_1996', CAST(COUNT(*) AS BIGINT)
      |  FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
      |ORDER BY cohort""".stripMargin

  /** q110: Benford first-digit screen over order amounts — the classic
    * fabricated-data detector: empirical first-digit shares vs the
    * Benford expectation log10(1+1/d). Expectations are EMBEDDED integer
    * ppm literals (no runtime log10 — a libm ulp cannot flip a rounding);
    * observed shares are integer ppm over a window total. One aggregate
    * pass; the 9-row compare is metadata. */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(s, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("v"))
      .select(substring(col("v").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy()
    counts
      .withColumn("total", sum(col("n")).over(w))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div total").as("obs_ppm"),
        expr(benfordCase).as("benford_ppm"))
      .orderBy(col("digit"))
  }

  /** round(log10(1+1/d)·10^6) for d = 1..9, precomputed so both engines
    * compare against identical literals. */
  private val benfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  private val benfordCase: String =
    "CAST(CASE digit " +
      benfordPpm.map { case (d, p) => s"WHEN $d THEN $p" }.mkString(" ") +
      " END AS BIGINT)"

  /** DuckDB oracle for [[benfordAudit]]. */
  val benfordAuditSql: String =
    s"""WITH c AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
       |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM orders GROUP BY 1)
       |SELECT digit, n,
       |  n * 1000000 // CAST(SUM(n) OVER () AS BIGINT) AS obs_ppm,
       |  $benfordCase AS benford_ppm
       |FROM c ORDER BY digit""".stripMargin

  /** q116: heavy-hitter tokens via the two-pass Misra-Gries protocol —
    * the frequent-items question ("which tokens exceed 1/k of the
    * corpus?") answered WITHOUT materializing the vocabulary-sized count
    * table. Pass 1 runs the [[graft.functions.MisraGries]] bounded-state
    * sketch (O(k) per partition, map-side partials, merged under the
    * Agarwal-et-al. mergeable-summaries rule) to produce a guaranteed
    * SUPERSET of ≤ k-1 candidates; pass 2 exact-counts ONLY the
    * broadcast candidates and applies the exact `n·k > N` filter, so the
    * OUTPUT is a pure function of the data — bit-identical to the
    * oracle's full GROUP BY — while the shuffle never carries more than
    * k-1 keys' partials. At 100 TB with an n-gram key space this is the
    * difference between an O(k) sketch and a vocabulary-scale shuffle
    * (the q111 Heaps'-law curve measures exactly how fast that
    * vocabulary grows).
    *
    * The synthetic corpus has a 31-word vocabulary, so every token
    * clears the 1/64 bar (the sketch never decrements here); the
    * adversarial decrement/merge paths are pinned by MisraGriesSpec on
    * a skewed large-vocabulary fixture instead. */
  def heavyHitters(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val toks = Tables.load(s, dir, "documents")
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
    val mg = udaf(graft.functions.MisraGries(k))
    val cands = toks.agg(mg(col("w")).as("cand"))
      .select(explode(col("cand")).as("w"))
    val tot = toks.agg(count(lit(1)).as("total_tokens"))
    toks.join(broadcast(cands), Seq("w"), "leftsemi")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_occurrences"))
      .crossJoin(broadcast(tot))
      .filter(col("n_occurrences") * lit(k.toLong) > col("total_tokens"))
      .select(col("w").as("token"), col("n_occurrences"),
        col("total_tokens"))
      .orderBy(col("token"))
  }

  /** DuckDB oracle for [[heavyHitters]] — the full GROUP BY the sketch
    * avoids; equality holds because the exact second pass makes the
    * Spark output independent of sketch internals. */
  def heavyHittersSql(k: Int = 64): String =
    s"""WITH toks AS (SELECT [t for t in
       |    string_split_regex(lower(text), '[^a-z0-9]+')
       |    if len(t) > 0] AS t FROM documents),
       |u AS (SELECT unnest(t) AS w FROM toks),
       |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY 1),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM u)
       |SELECT w AS token, n AS n_occurrences, tot AS total_tokens
       |FROM c, t WHERE n * $k > tot ORDER BY token""".stripMargin

  /** DuckDB oracle for [[revenueShare]]. */
  val revenueShareSql: String =
    """WITH b AS (SELECT r_name, n_name,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2)
      |SELECT r_name, n_name, rev_cents,
      |  CAST(rev_cents * 1000000
      |    // SUM(rev_cents) OVER (PARTITION BY r_name) AS BIGINT)
      |    AS region_share_ppm,
      |  CAST(rev_cents * 1000000 // SUM(rev_cents) OVER () AS BIGINT)
      |    AS total_share_ppm
      |FROM b ORDER BY 1, 2""".stripMargin

  /** q119: skyline (Pareto frontier) of the part catalog — the sizes where
    * the cheapest part is strictly cheaper than the cheapest part of EVERY
    * larger size (maximize size, minimize price; a point survives iff
    * nothing weakly dominates it). The multi-objective "best tradeoffs"
    * query the OLAP literature names SKYLINE — no single ORDER BY answers
    * it, and the naive form is a quadratic NOT EXISTS self-join.
    *
    * Scale shape: one partial/final aggregate collapses the catalog to the
    * per-size minimum (≤ |distinct sizes| rows — vocabulary scale), a
    * broadcast join back pins the exact count and representative part at
    * each minimum (min-partkey, so the row is data-determined), and the
    * dominance test is one running-min window over the size-sorted
    * vocabulary frame — the window is unpartitioned but runs at metadata
    * scale, the q105 convention, never over the catalog itself. */
  def skyline(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select(col("p_size"),
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"),
      col("p_partkey"))
    val best = p.groupBy(col("p_size")).agg(min(col("cents")).as("best_cents"))
      .withColumnRenamed("p_size", "b_size")
    val at = p.join(broadcast(best),
        col("p_size") === col("b_size") && col("cents") === col("best_cents"))
      .groupBy(col("b_size").as("p_size"), col("best_cents"))
      .agg(count(lit(1)).as("n_at_best"),
        min(col("p_partkey")).as("best_partkey"))
    val wLarger = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    at.withColumn("min_larger", min(col("best_cents")).over(wLarger))
      .filter(col("min_larger").isNull ||
        col("best_cents") < col("min_larger"))
      .select(col("p_size"), col("best_cents"), col("n_at_best"),
        col("best_partkey"))
      .orderBy(col("p_size"))
  }

  /** DuckDB oracle for [[skyline]]. */
  val skylineSql: String =
    """WITH p AS (SELECT p_size,
      |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents, p_partkey
      |  FROM part),
      |b AS (SELECT p_size, MIN(cents) AS best_cents FROM p GROUP BY 1),
      |a AS (SELECT p.p_size, b.best_cents,
      |    CAST(COUNT(*) AS BIGINT) AS n_at_best,
      |    MIN(p_partkey) AS best_partkey
      |  FROM p JOIN b ON p.p_size = b.p_size AND p.cents = b.best_cents
      |  GROUP BY 1, 2),
      |f AS (SELECT *, MIN(best_cents) OVER (ORDER BY p_size DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ml FROM a)
      |SELECT p_size, best_cents, n_at_best, best_partkey FROM f
      |WHERE ml IS NULL OR best_cents < ml
      |ORDER BY p_size""".stripMargin

  /** q134: chi-square independence screen between order status and order
    * priority — the categorical-association forensic test completing the
    * audit family (q104 moments, q110 Benford, q106 fan-out): a
    * training-data pipeline runs exactly this to detect label/slice
    * coupling before a split ships. Per-cell contributions to the χ²
    * statistic, cross-multiplied to EXACT integers (the q104 convention):
    * (O·N − R·C)²·10⁶ div (N·R·C) in ppm, with the expected count in
    * milli-units — no float mean, no float expected value, so the flag
    * set is partitioning-invariant and hash-gated.
    *
    * Scale shape: ONE corpus-scale aggregate reduces orders to the
    * contingency cells; row totals, column totals, and N are re-aggregated
    * from the CELL frame (metadata scale) and broadcast back — the fact
    * table is scanned once. Long-overflow boundary: O·N stays below 2⁶³
    * up to ~3·10⁹ orders; past that both engines widen the products
    * through DECIMAL(38,0)/HUGEINT the q104 way (the square already
    * does). */
  def chiSquare(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.load(s, dir, "orders")
      .select(col("o_orderstatus").as("status"),
        col("o_orderpriority").as("prio"))
      .groupBy(col("status"), col("prio"))
      .agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy(col("status")).agg(sum(col("obs")).as("r_tot"))
    val colT = cells.groupBy(col("prio")).agg(sum(col("obs")).as("c_tot"))
    val nT = cells.agg(sum(col("obs")).as("n_tot"))
    cells
      .join(broadcast(rowT), "status")
      .join(broadcast(colT), "prio")
      .crossJoin(broadcast(nT))
      .select(col("status"), col("prio"), col("obs"),
        expr("r_tot * c_tot * 1000 div n_tot").as("exp_milli"),
        expr("CAST(obs * n_tot - r_tot * c_tot AS DECIMAL(38,0)) * " +
          "(obs * n_tot - r_tot * c_tot) * 1000000 " +
          "div (n_tot * r_tot * c_tot)").as("contrib_ppm"))
      .orderBy(col("status"), col("prio"))
  }

  /** q139: two-sample Kolmogorov-Smirnov drift test — the DISTRIBUTION
    * companion to q134's categorical screen: the largest gap between two
    * samples' empirical CDFs, the statistic a training pipeline runs to
    * detect numeric drift between corpus snapshots or data slices. Here:
    * urgent vs low-priority order values.
    *
    * Exactness: D = max_v |F1(v) − F2(v)| cross-multiplied to integers —
    * max |cum1(v)·n2 − cum2(v)·n1| over the distinct-value frame; no
    * float CDFs, so the statistic (and its ppm form d/(n1·n2)) is
    * partitioning-invariant. The argmax value is tie-broken to the
    * smallest v.
    *
    * Scale shape: one corpus aggregate to the distinct-value frame, then
    * BOTH cumulative distributions ride [[Ranks.globalRunningSum]] — the
    * range-partitioned prefix scan (p-way parallel), never an
    * unpartitioned window over the value domain (the q89-documented
    * single-reducer trap). Long-overflow boundary: cum·n stays below
    * 2⁶³ up to ~3·10⁹ rows per side; past that widen through
    * DECIMAL(38,0)/HUGEINT the q104 way. */
  def ksDrift(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("g1"))
    val vals = o.groupBy(col("v"))
      .agg(sum(col("g1")).as("c1"), sum(lit(1L) - col("g1")).as("c2"))
    // both CDFs ride ONE range exchange/pin (the multi-measure prefix
    // scan): the former chained globalRunningSum calls re-ranged and
    // re-pinned a frame already sorted by v (guide §2.4)
    val cum = Ranks.globalRunningSums(vals, Seq(), Seq("v"),
      Seq("c1" -> "cum1", "c2" -> "cum2"))
    val n = vals.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val d = cum.crossJoin(broadcast(n))
      .select(col("v"), col("n1"), col("n2"),
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("dabs"))
      .transform(PinExplain.pinLazy) // consumed by the max aggregate AND the
                              // argmax join-back (multi-consumer pin)
    val dmax = d.agg(max(col("dabs")).as("d_scaled"))
    d.join(broadcast(dmax), col("dabs") === col("d_scaled"))
      .groupBy(col("n1"), col("n2"), col("d_scaled"))
      .agg(min(col("v")).as("at_value"))
      .select(col("n1"), col("n2"), col("d_scaled"),
        expr("d_scaled * 1000000 div (n1 * n2)").as("ks_ppm"),
        col("at_value"))
  }

  /** DuckDB oracle for [[ksDrift]]. */
  val ksDriftSql: String =
    """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      |vals AS (SELECT v, SUM(g1) AS c1, SUM(1 - g1) AS c2 FROM o
      |  GROUP BY 1),
      |cum AS (SELECT v, SUM(c1) OVER (ORDER BY v) AS cum1,
      |    SUM(c2) OVER (ORDER BY v) AS cum2 FROM vals),
      |n AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM vals),
      |d AS (SELECT v, n1, n2, abs(cum1 * n2 - cum2 * n1) AS dabs
      |  FROM cum CROSS JOIN n),
      |dm AS (SELECT MAX(dabs) AS d_scaled FROM d)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(d_scaled AS BIGINT) AS d_scaled,
      |  CAST(d_scaled * 1000000 // (n1 * n2) AS BIGINT) AS ks_ppm,
      |  MIN(v) AS at_value
      |FROM d JOIN dm ON dabs = d_scaled
      |GROUP BY 1, 2, 3, 4""".stripMargin

  /** DuckDB oracle for [[chiSquare]]. */
  val chiSquareSql: String =
    """WITH cells AS (SELECT o_orderstatus AS status,
      |    o_orderpriority AS prio, COUNT(*) AS obs
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT status, SUM(obs) AS r_tot FROM cells GROUP BY 1),
      |ct AS (SELECT prio, SUM(obs) AS c_tot FROM cells GROUP BY 1),
      |nt AS (SELECT SUM(obs) AS n_tot FROM cells)
      |SELECT status, prio, CAST(obs AS BIGINT) AS obs,
      |  CAST(r_tot * c_tot * 1000 // n_tot AS BIGINT) AS exp_milli,
      |  CAST(CAST(obs * n_tot - r_tot * c_tot AS HUGEINT) *
      |    (obs * n_tot - r_tot * c_tot) * 1000000
      |    // (n_tot * r_tot * c_tot) AS BIGINT) AS contrib_ppm
      |FROM cells JOIN rt USING (status) JOIN ct USING (prio)
      |CROSS JOIN nt
      |ORDER BY status, prio""".stripMargin

  /** q150: split-balance audit — the release gate for the q47
    * deterministic train/val/test assignment: chi-square independence of
    * split × {lang, source, length-bucket} in ONE corpus pass, proving
    * the content-hash split did not correlate with any stratum (the iid
    * property every eval benchmark silently assumes). Per dimension:
    * exact-integer chi² (q134's HUGEINT/DECIMAL(38,0) cell convention,
    * summed), degrees of freedom, and row count — a skewed split shows
    * up as a chi2_ppm far above the dof·10⁶ expectation.
    *
    * Scale shape: the corpus melts to (split, dim, value) rows — ×3 the
    * scan, emitted BEFORE the aggregate so the shuffle carries cell
    * counts only; every total/denominator frame is dimension-sized and
    * broadcast. */
  def splitBalanceAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val h = PortableHash.h60(col("text")) % 100
    splitBalanceFrom(Tables.load(s, dir, "documents")
      .select(
        when(h < 80, "train").when(h < 90, "val").otherwise("test")
          .as("split"),
        col("lang"), col("source"),
        expr("CAST(n_chars div 100 AS STRING)").as("len_bucket")))
  }

  /** The melt → chi² core over any (split, lang, source, len_bucket)
    * frame (fixture specs inject skewed splits here). */
  def splitBalanceFrom(docs: DataFrame): DataFrame = {
    val melted = docs.select(col("split"), explode(array(
        struct(lit("lang").as("dim"), col("lang").as("dv")),
        struct(lit("len_bucket").as("dim"), col("len_bucket").as("dv")),
        struct(lit("source").as("dim"), col("source").as("dv")))).as("e"))
      .select(col("split"), col("e.dim").as("dim"), col("e.dv").as("dv"))
    val cells = melted.groupBy(col("dim"), col("split"), col("dv"))
      .agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy(col("dim"), col("split"))
      .agg(sum(col("obs")).as("r_tot"))
    val colT = cells.groupBy(col("dim"), col("dv"))
      .agg(sum(col("obs")).as("c_tot"))
    val nT = cells.groupBy(col("dim")).agg(sum(col("obs")).as("n_tot"))
    val contrib = cells
      .join(broadcast(rowT), Seq("dim", "split"))
      .join(broadcast(colT), Seq("dim", "dv"))
      .join(broadcast(nT), Seq("dim"))
      .select(col("dim"),
        expr("CAST(obs * n_tot - r_tot * c_tot AS DECIMAL(38,0)) * " +
          "(obs * n_tot - r_tot * c_tot) * 1000000 " +
          "div (n_tot * r_tot * c_tot)").as("cp"))
    val dof = cells.groupBy(col("dim"))
      .agg(((countDistinct(col("split")) - 1) *
        (countDistinct(col("dv")) - 1)).as("dof"))
    contrib.groupBy(col("dim")).agg(sum(col("cp")).as("chi2_ppm"))
      .join(dof, Seq("dim")).join(nT, Seq("dim"))
      .select(col("dim").as("dimension"), col("chi2_ppm"), col("dof"),
        col("n_tot").as("n_rows"))
      .orderBy(col("dimension"))
  }

  /** DuckDB oracle for [[splitBalanceAudit]]. */
  def splitBalanceAuditSql: String = {
    val h = s"(${graft.functions.PortableHash.h60Sql("text")} % 100)"
    s"""WITH d AS (SELECT
       |    CASE WHEN $h < 80 THEN 'train' WHEN $h < 90 THEN 'val'
       |      ELSE 'test' END AS split,
       |    lang, source, CAST(n_chars // 100 AS VARCHAR) AS len_bucket
       |  FROM documents),
       |m AS (SELECT split, 'lang' AS dim, lang AS dv FROM d
       |  UNION ALL SELECT split, 'len_bucket', len_bucket FROM d
       |  UNION ALL SELECT split, 'source', source FROM d),
       |cells AS (SELECT dim, split, dv, COUNT(*) AS obs FROM m
       |  GROUP BY 1, 2, 3),
       |rt AS (SELECT dim, split, SUM(obs) AS r_tot FROM cells GROUP BY 1, 2),
       |ct AS (SELECT dim, dv, SUM(obs) AS c_tot FROM cells GROUP BY 1, 2),
       |nt AS (SELECT dim, SUM(obs) AS n_tot FROM cells GROUP BY 1),
       |contrib AS (SELECT c.dim,
       |    CAST(CAST(obs * n_tot - r_tot * c_tot AS HUGEINT) *
       |      (obs * n_tot - r_tot * c_tot) * 1000000
       |      // (n_tot * r_tot * c_tot) AS BIGINT) AS cp
       |  FROM cells c JOIN rt USING (dim, split) JOIN ct USING (dim, dv)
       |  JOIN nt USING (dim)),
       |dof AS (SELECT dim,
       |    (COUNT(DISTINCT split) - 1) * (COUNT(DISTINCT dv) - 1) AS dof
       |  FROM cells GROUP BY 1)
       |SELECT contrib.dim AS dimension, CAST(SUM(cp) AS BIGINT) AS chi2_ppm,
       |  CAST(MIN(dof.dof) AS BIGINT) AS dof,
       |  CAST(MIN(nt.n_tot) AS BIGINT) AS n_rows
       |FROM contrib JOIN dof USING (dim) JOIN nt USING (dim)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q149: k-anonymity generalization ladder — the privacy release gate
    * companion to q44's PII scan (Sweeney 2002): documents grouped by the
    * quasi-identifier tuple (lang, source, length bucket), then by each
    * coarser generalization, reporting per level how many groups fall
    * below k=`k` members and how many rows sit in those re-identifiable
    * groups. The release decision reads off the first level whose
    * rows_at_risk hits zero.
    *
    * One pass: the corpus reduces to the finest-combo counts first (a
    * plain two-phase aggregate), then `rollup` over the PARTIAL frame
    * walks the ladder (the q85 two-level trick — counts re-sum exactly;
    * Expand touches the combo frame, never scan rows); the per-level
    * report aggregates the rollup output, which is metadata-sized. */
  def kAnonymityAudit(s: SparkSession, dir: String, k: Long = 5L)
  : DataFrame = {
    val fine = Tables.load(s, dir, "documents")
      .select(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("c"))
    fine.rollup(col("lang"), col("source"), col("len_bucket"))
      .agg(grouping_id().as("gid"), sum(col("c")).as("gsize"))
      .groupBy(col("gid"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("gsize") < k, 1L).otherwise(0L)).as("n_small_groups"),
        coalesce(sum(when(col("gsize") < k, col("gsize"))), lit(0L))
          .as("rows_at_risk"))
      .select(col("gid"),
        expr("""CASE gid WHEN 0 THEN 'lang,source,len_bucket'
                |  WHEN 1 THEN 'lang,source' WHEN 3 THEN 'lang'
                |  ELSE '*' END""".stripMargin).as("quasi_ids"),
        col("n_groups"), col("n_small_groups"), col("rows_at_risk"))
      .orderBy(col("gid"))
  }

  /** DuckDB oracle for [[kAnonymityAudit]] (GROUPING bit convention as
    * q85/q95). */
  def kAnonymityAuditSql(k: Long = 5L): String =
    s"""WITH fine AS (SELECT lang, source, n_chars // 100 AS len_bucket,
       |    COUNT(*) AS c
       |  FROM documents GROUP BY 1, 2, 3),
       |lad AS (SELECT
       |    GROUPING(lang) * 4 + GROUPING(source) * 2 +
       |      GROUPING(len_bucket) AS gid_raw,
       |    SUM(c) AS gsize
       |  FROM fine GROUP BY ROLLUP (lang, source, len_bucket))
       |SELECT CAST(gid_raw AS BIGINT) AS gid,
       |  CASE gid_raw WHEN 0 THEN 'lang,source,len_bucket'
       |    WHEN 1 THEN 'lang,source' WHEN 3 THEN 'lang'
       |    ELSE '*' END AS quasi_ids,
       |  CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  CAST(SUM(CASE WHEN gsize < $k THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_small_groups,
       |  CAST(COALESCE(SUM(CASE WHEN gsize < $k THEN gsize END), 0)
       |    AS BIGINT) AS rows_at_risk
       |FROM lad GROUP BY 1, 2 ORDER BY gid""".stripMargin

  /** q166: filter-agreement audit — Cohen's kappa between two quality
    * rules over the corpus, all-integer: rule A = stopword density ≥ 20%
    * (5·stop_hits ≥ n_tokens), rule B = mean token length in [3, 9]
    * (3·n ≤ Σlen ≤ 9·n) — both cross-multiplied, no float thresholds.
    * κ = (N·po_num − pe_num)·10⁶ div (N² − pe_num) with po_num = n11+n00
    * and pe_num the marginal-product sum — chance-corrected agreement,
    * the number that tells a curation team whether two filters are
    * redundant (κ→1), independent (κ→0), or conflicting (κ<0). N² ·10⁶
    * stays far inside Long at any realistic corpus count per partition
    * report; at 10⁹ docs widen through DECIMAL(38,0) as q134 does.
    *
    * Scale: one corpus scan to four cell counters — a single partial-agg
    * pass, no shuffle beyond the 1-row final combine. */
  def filterAgreement(s: SparkSession, dir: String): DataFrame = {
    val allStops = TextQueries.stopwords.values.flatten.toSeq.distinct
    val flags = graft.Tables.load(s, dir, "documents")
      .select(graft.functions.Text.tokens(col("text")).as("toks"))
      .select(size(col("toks")).cast("long").as("n"),
        TextQueries.hits(col("toks"), allStops).cast("long").as("sh"),
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t)).as("sl"))
      .select((col("sh") * 5 >= col("n")).as("a"),
        (col("sl") >= col("n") * 3 && col("sl") <= col("n") * 9).as("b"))
    flags.agg(
        count(lit(1)).as("n_docs"),
        sum((col("a") && col("b")).cast("long")).as("n11"),
        sum((col("a") && !col("b")).cast("long")).as("n10"),
        sum((!col("a") && col("b")).cast("long")).as("n01"),
        sum((!col("a") && !col("b")).cast("long")).as("n00"))
      // guards: an EMPTY corpus degrades to zero rows-of-zeros instead of
      // an ANSI divide-by-zero, and a DEGENERATE table (all mass in one
      // cell -> pe = n², chance agreement total) reports κ = 10⁶ exactly
      // when observed agreement is also total, else 0 — the standard
      // convention for the undefined-κ corner
      .select(col("n_docs"), col("n11"), col("n10"), col("n01"), col("n00"),
        expr("CASE WHEN n_docs = 0 THEN 0 " +
          "ELSE (n11 + n00) * 1000000 div n_docs END").as("po_ppm"),
        expr("CASE WHEN n_docs = 0 THEN 0 " +
          "ELSE ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) " +
          "* 1000000 div (n_docs * n_docs) END").as("pe_ppm"),
        expr("CASE WHEN n_docs = 0 THEN 0 " +
          "WHEN n_docs * n_docs = (n11 + n10) * (n11 + n01) " +
          "+ (n01 + n00) * (n10 + n00) THEN " +
          "  CASE WHEN n11 + n00 = n_docs THEN 1000000 ELSE 0 END " +
          "ELSE (n_docs * (n11 + n00) - ((n11 + n10) * (n11 + n01) " +
          "+ (n01 + n00) * (n10 + n00))) * 1000000 div " +
          "(n_docs * n_docs - ((n11 + n10) * (n11 + n01) " +
          "+ (n01 + n00) * (n10 + n00))) END").as("kappa_ppm"))
  }

  /** DuckDB oracle for [[filterAgreement]]. */
  val filterAgreementSql: String = {
    val stops = ("'" + Seq("the","a","of","and","to","in","is","it","for",
      "on","der","die","das","und","ist","ein","zu","mit","von","nicht",
      "el","la","de","que","y","en","un","es","por","con","le","et","est",
      "une","dans","pour").mkString("','") + "'")
    s"""WITH t AS (SELECT
       |    [t for t in string_split_regex(lower(text), '[^a-z0-9]+')
       |     if len(t) > 0] AS toks
       |  FROM documents),
       |f AS (SELECT
       |    CAST(len(toks) AS BIGINT) AS n,
       |    CAST(len([x for x in toks if list_contains([$stops], x)])
       |      AS BIGINT) AS sh,
       |    CAST(COALESCE(list_sum([len(x) for x in toks]), 0)
       |      AS BIGINT) AS sl
       |  FROM t),
       |g AS (SELECT (sh * 5 >= n) AS a,
       |    (sl >= n * 3 AND sl <= n * 9) AS b FROM f),
       |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
       |    CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
       |    CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
       |    CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
       |  FROM g)
       |SELECT n_docs, n11, n10, n01, n00,
       |  CASE WHEN n_docs = 0 THEN 0
       |    ELSE (n11 + n00) * 1000000 // n_docs END AS po_ppm,
       |  CASE WHEN n_docs = 0 THEN 0
       |    ELSE ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
       |    * 1000000 // (n_docs * n_docs) END AS pe_ppm,
       |  CASE WHEN n_docs = 0 THEN 0
       |    WHEN n_docs * n_docs = (n11 + n10) * (n11 + n01)
       |      + (n01 + n00) * (n10 + n00) THEN
       |      CASE WHEN n11 + n00 = n_docs THEN 1000000 ELSE 0 END
       |    ELSE (n_docs * (n11 + n00) - ((n11 + n10) * (n11 + n01)
       |    + (n01 + n00) * (n10 + n00))) * 1000000 //
       |    (n_docs * n_docs - ((n11 + n10) * (n11 + n01)
       |    + (n01 + n00) * (n10 + n00))) END AS kappa_ppm
       |FROM c""".stripMargin
  }
}
