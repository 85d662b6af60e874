package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{PortableHash, Text}

/** Training-data LAYOUT operators — the physical-arrangement step between
  * curation (what goes in) and the training loop (how it is consumed):
  * packing documents into fixed context windows, assigning output shards,
  * and accounting for padding waste under different batching orders. The
  * reference pipeline stops at per-entity stats sinks
  * (`gmall-realtime/.../app/dws/` DWS sinks); these are the operations its
  * output would feed in an LLM-training deployment, and all three are
  * pure functions of the data — hash-gated like every other query. */
object Layout {

  /** q161: GPT-style sequence packing — documents concatenated in doc_id
    * order and cut into `ctxLen`-token context windows. Per document: its
    * global token offset, first window, and how many windows it spans
    * (spans > 1 = the doc is split across a window boundary — the number
    * a packing-quality review reads, since attention never sees across
    * the cut). The layout is a pure function of (corpus, ctxLen): stable
    * across re-runs and resumable mid-epoch, the q159 reproducibility
    * discipline applied to packing.
    *
    * Scale: the only non-scan work is the global running sum, which rides
    * [[Ranks.globalRunningSum]]'s range-partitioned Terasort construction
    * — never a single-reducer window over the corpus. */
  def sequencePack(s: SparkSession, dir: String,
                   ctxLen: Long = 2048L): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    Ranks.globalRunningSum(docs, Seq.empty, Seq("doc_id"), "n_tokens")
      .select(col("doc_id"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_off"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        expr(s"start_off div $ctxLen").as("window_first"),
        when(col("n_tokens") > 0,
          expr(s"(start_off + n_tokens - 1) div $ctxLen") -
            expr(s"start_off div $ctxLen") + 1L)
          .otherwise(0L).as("n_windows"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[sequencePack]]. */
  def sequencePackSql(ctxLen: Long = 2048L): String =
    s"""WITH d AS (SELECT doc_id,
       |    CAST(len([x for x in string_split_regex(lower(text),
       |      '[^a-z0-9]+') if len(x) > 0]) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
       |  FROM d)
       |SELECT doc_id, n_tokens, start_off,
       |  CAST(start_off // $ctxLen AS BIGINT) AS window_first,
       |  CAST(CASE WHEN n_tokens > 0
       |    THEN (start_off + n_tokens - 1) // $ctxLen
       |      - start_off // $ctxLen + 1
       |    ELSE 0 END AS BIGINT) AS n_windows
       |FROM c ORDER BY doc_id""".stripMargin

  /** q162: rendezvous (highest-random-weight) shard assignment — each
    * document goes to the shard maximizing h60(doc_id ‖ ':' ‖ shard),
    * reported as per-shard (docs, tokens, chars, share-ppm). The output
    * layout step of a corpus release: HRW is stateless (any writer
    * computes any doc's shard with no directory service), uniform (the
    * report IS the balance audit), and minimally disruptive — growing to
    * S+1 shards moves only ≈1/(S+1) of documents, which the spec
    * measures rather than asserts folklore.
    *
    * Scale: a per-row expression over the scan (S=16 hash evaluations,
    * no shuffle) plus one S-group aggregate. */
  def shardAssign(s: SparkSession, dir: String, shards: Int = 16): DataFrame = {
    val docs = shardOf(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
          col("n_chars").cast("long").as("n_chars")),
      shards)
    val total = docs.agg(count(lit(1)).as("n_total"))
    docs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .crossJoin(broadcast(total))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_chars"),
        expr("n_docs * 1000000 div n_total").as("share_ppm"))
      .orderBy(col("shard"))
  }

  /** Adds the HRW `shard` column: argmax over (h60(doc:s), s). */
  def shardOf(docs: DataFrame, shards: Int): DataFrame =
    docs.withColumn("shard",
      array_max(array((0 until shards).map { sh =>
        struct(
          PortableHash.h60(
            concat(col("doc_id").cast("string"), lit(s":$sh"))).as("h"),
          lit(sh.toLong).as("s"))
      }: _*)).getField("s"))

  /** DuckDB oracle for [[shardAssign]]. */
  def shardAssignSql(shards: Int = 16): String = {
    val h = PortableHash.h60Sql(
      "CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)")
    s"""WITH d AS (SELECT doc_id,
       |    CAST(len([x for x in string_split_regex(lower(text),
       |      '[^a-z0-9]+') if len(x) > 0]) AS BIGINT) AS n_tokens,
       |    CAST(n_chars AS BIGINT) AS n_chars
       |  FROM documents),
       |a AS (SELECT doc_id, n_tokens, n_chars, s,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY ($h) DESC, s DESC) AS rn
       |  FROM d, generate_series(0, ${shards - 1}) t(s)),
       |w AS (SELECT doc_id, n_tokens, n_chars, CAST(s AS BIGINT) AS shard
       |  FROM a WHERE rn = 1),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM w)
       |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |  CAST(COUNT(*) AS BIGINT) * 1000000 // n.n_total AS share_ppm
       |FROM w CROSS JOIN n
       |GROUP BY shard, n.n_total ORDER BY shard""".stripMargin
  }

  /** q163: padding-waste accounting for length-bucketed batching — the
    * measured case for sorting by length before batching (the fairseq/
    * dynamic-batching practice): documents grouped into `batchSize`-doc
    * batches two ways — arrival (doc_id) order vs (length, doc_id) order
    * — and each strategy's padded-token volume (Σ batch-max × batch-size)
    * is compared against the real token volume as integer waste-ppm. The
    * report quantifies what length bucketing buys on THIS corpus instead
    * of asserting the folklore.
    *
    * Scale: two [[Ranks.globalRowNumber]] range-partitioned ranks (no
    * single-reducer window), two batch-keyed aggregates. */
  def lengthBatchingWaste(s: SparkSession, dir: String,
                          batchSize: Int = 32): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .transform(PinExplain.pin) // feeds both rank passes
    def wasteOf(ordered: DataFrame, strategy: String): DataFrame =
      ordered
        .withColumn("batch_id", expr(s"(rnk - 1) div $batchSize"))
        .groupBy(col("batch_id"))
        .agg(count(lit(1)).as("bn"), max(col("n_tokens")).as("mx"),
          sum(col("n_tokens")).as("sm"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("mx") * col("bn")).as("padded_tokens"),
          sum(col("sm")).as("real_tokens"))
        .select(lit(strategy).as("strategy"), col("n_batches"),
          col("padded_tokens"), col("real_tokens"),
          expr("CASE WHEN padded_tokens = 0 THEN 0 " +
            "ELSE (padded_tokens - real_tokens) * 1000000 " +
            "div padded_tokens END").as("waste_ppm"))
    val out = wasteOf(Ranks.globalRowNumber(docs, Seq.empty, Seq("doc_id")),
        "by_arrival")
      .unionByName(
        wasteOf(Ranks.globalRowNumber(docs, Seq.empty,
          Seq("n_tokens", "doc_id")), "by_length"))
      .orderBy(col("strategy"))
    // two-row report: pin it and release the pinned token-count frame
    // (no consumer past the two rank passes above)
    graft.operators.Dedup.pinAndRelease(out, docs)
  }

  /** DuckDB oracle for [[lengthBatchingWaste]]. */
  def lengthBatchingWasteSql(batchSize: Int = 32): String =
    s"""WITH d AS (SELECT doc_id,
       |    CAST(len([x for x in string_split_regex(lower(text),
       |      '[^a-z0-9]+') if len(x) > 0]) AS BIGINT) AS n_tokens
       |  FROM documents),
       |ranked AS (
       |  SELECT 'by_arrival' AS strategy, n_tokens,
       |    row_number() OVER (ORDER BY doc_id) AS rnk FROM d
       |  UNION ALL
       |  SELECT 'by_length' AS strategy, n_tokens,
       |    row_number() OVER (ORDER BY n_tokens, doc_id) AS rnk FROM d),
       |b AS (SELECT strategy, (rnk - 1) // $batchSize AS batch_id,
       |    CAST(COUNT(*) AS BIGINT) AS bn,
       |    CAST(MAX(n_tokens) AS BIGINT) AS mx,
       |    CAST(SUM(n_tokens) AS BIGINT) AS sm
       |  FROM ranked GROUP BY 1, 2)
       |SELECT strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
       |  CAST(SUM(mx * bn) AS BIGINT) AS padded_tokens,
       |  CAST(SUM(sm) AS BIGINT) AS real_tokens,
       |  CASE WHEN SUM(mx * bn) = 0 THEN 0
       |    ELSE CAST(SUM(mx * bn) - SUM(sm) AS BIGINT) * 1000000
       |    // CAST(SUM(mx * bn) AS BIGINT) END AS waste_ppm
       |FROM b GROUP BY strategy ORDER BY strategy""".stripMargin

  /** q187: cross-document attention contamination in packed windows —
    * the audit behind boundary-masked attention (the Llama-3-style
    * document mask): under q161's packing, a context window holding m
    * documents lets (T² − Σlᵢ²)/2 of its T·(T−1)/2 unordered
    * query–key pairs attend ACROSS a document boundary (lᵢ = the
    * segment lengths inside the window; the last window may have
    * T < ctxLen). Report, per docs-per-window bucket: window count,
    * token mass, and mean contamination ppm — the m = 1 row is the
    * clean mass, the tail rows are why the mask exists, and the
    * ctxLen-vs-doc-length tradeoff is read straight off the bucket
    * distribution.
    *
    * Integer-exact throughout: contamination per window is
    * (T·T − Σl²)·10⁶ div (T·(T−1)) (0 when T ≤ 1), the bucket mean is
    * an integer div of summed ppms.
    *
    * Scale: rides q161's [[Ranks.globalRunningSum]] offsets; each doc
    * explodes into its (window, segment) rows via `sequence` (fan-out
    * ≈ n_tokens/ctxLen + 1, sub-linear blow-up), then ONE window-keyed
    * partial-agg shuffle of (window, l) longs and a bucket-sized
    * reduce. Segment arithmetic never leaves the executors. */
  def packContamination(s: SparkSession, dir: String,
                        ctxLen: Long = 2048L): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val segs = Ranks.globalRunningSum(docs, Seq.empty, Seq("doc_id"),
      "n_tokens")
      .select(col("doc_id"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("off"))
      .select(explode(sequence(expr(s"off div $ctxLen"),
        expr(s"(off + n_tokens - 1) div $ctxLen"))).as("win"),
        col("off"), col("n_tokens"))
      .select(col("win"),
        (least(col("off") + col("n_tokens"), (col("win") + 1) * ctxLen) -
          greatest(col("off"), col("win") * ctxLen)).as("l"))
    val wins = segs.groupBy(col("win"))
      .agg(count(lit(1)).as("m"), sum(col("l")).as("t"),
        sum(col("l") * col("l")).as("sl2"))
    contamReport(wins)
  }

  /** The q187 report off a (win, m, t, sl2) window table — shared by the
    * batch query and the [[graft.streaming.PackContamStream]] twin,
    * whose state IS this table merged by sum per micro-batch. */
  private[graft] def contamReport(winTable: DataFrame): DataFrame =
    winTable
      .select(col("m"), col("t"),
        expr("CASE WHEN t <= 1 THEN 0" +
          " ELSE (t * t - sl2) * 1000000 div (t * (t - 1)) END")
          .as("contam_ppm"))
      .groupBy(col("m").as("docs_per_window"))
      .agg(count(lit(1)).as("n_windows"), sum(col("t")).as("tokens"),
        sum(col("contam_ppm")).as("s_ppm"))
      .select(col("docs_per_window"), col("n_windows"), col("tokens"),
        expr("s_ppm div n_windows").as("mean_contam_ppm"))
      .orderBy(col("docs_per_window"))

  /** q193: context-length decision sweep — q187's contamination audit
    * parameterized over candidate window sizes, plus the padding the
    * packer pays at each: per ctxLen, window count, token mass, share of
    * CLEAN (single-doc) windows in ppm, mean cross-doc contamination
    * ppm, and pad_ppm (only the final window is partial under dense
    * packing, so padding = n·L − tokens). Larger windows amortize
    * padding but fragment more documents across boundaries — this table
    * IS the tradeoff, one row per candidate, read before a training run
    * commits to a ctxLen. Integer-exact throughout (q187 arithmetic).
    *
    * Scale: ONE range-partitioned running-sum pass (pinned) is shared by
    * every candidate; each ctxLen then costs one sequence-explode and
    * one window-keyed partial-agg shuffle of longs — the report is
    * |ctxLens| single-row aggregates unioned. */
  def ctxLenSweep(s: SparkSession, dir: String,
                  ctxLens: Seq[Long] =
                    Seq(512L, 1024L, 2048L, 4096L)): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val offs = Ranks.globalRunningSum(docs, Seq.empty, Seq("doc_id"),
      "n_tokens")
      .select(col("n_tokens"), (col("cum") - col("n_tokens")).as("off"))
      .transform(PinExplain.pin) // one offsets pass feeds every candidate
    ctxLens.map { ctxLen =>
      val segs = offs
        .select(explode(sequence(expr(s"off div $ctxLen"),
          expr(s"(off + n_tokens - 1) div $ctxLen"))).as("win"),
          col("off"), col("n_tokens"))
        .select(col("win"),
          (least(col("off") + col("n_tokens"), (col("win") + 1) * ctxLen) -
            greatest(col("off"), col("win") * ctxLen)).as("l"))
      segs.groupBy(col("win"))
        .agg(count(lit(1)).as("m"), sum(col("l")).as("t"),
          sum(col("l") * col("l")).as("sl2"))
        .select(col("m"), col("t"),
          expr("CASE WHEN t <= 1 THEN 0" +
            " ELSE (t * t - sl2) * 1000000 div (t * (t - 1)) END")
            .as("contam_ppm"))
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("m") === 1, 1L).otherwise(0L)).as("clean"),
          sum(col("t")).as("tokens"), sum(col("contam_ppm")).as("s_ppm"))
        .select(lit(ctxLen).as("ctx_len"), col("n_windows"), col("tokens"),
          expr("clean * 1000000 div n_windows").as("clean_ppm"),
          expr("s_ppm div n_windows").as("mean_contam_ppm"),
          expr(s"(n_windows * $ctxLen - tokens) * 1000000" +
            s" div (n_windows * $ctxLen)").as("pad_ppm"))
    }.reduce(_ unionByName _).orderBy(col("ctx_len"))
  }

  /** DuckDB oracle for [[ctxLenSweep]] — the q187 chain per candidate,
    * UNION ALL'd. */
  def ctxLenSweepSql(ctxLens: Seq[Long] =
                       Seq(512L, 1024L, 2048L, 4096L)): String = {
    def leg(ctxLen: Long): String =
      s"""SELECT $ctxLen AS ctx_len,
         |  CAST(COUNT(*) AS BIGINT) AS n_windows,
         |  CAST(SUM(t) AS BIGINT) AS tokens,
         |  CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS clean_ppm,
         |  CAST(SUM(contam_ppm) // COUNT(*) AS BIGINT) AS mean_contam_ppm,
         |  CAST((COUNT(*) * $ctxLen - SUM(t)) * 1000000
         |    // (COUNT(*) * $ctxLen) AS BIGINT) AS pad_ppm
         |FROM (SELECT win, m, t, CASE WHEN t <= 1 THEN 0
         |    ELSE (t * t - sl2) * 1000000 // (t * (t - 1)) END AS contam_ppm
         |  FROM (SELECT win, CAST(COUNT(*) AS BIGINT) AS m,
         |      CAST(SUM(l) AS BIGINT) AS t,
         |      CAST(SUM(l * l) AS BIGINT) AS sl2
         |    FROM (SELECT unnest(generate_series(off // $ctxLen,
         |          (off + n_tokens - 1) // $ctxLen)) AS win, off, n_tokens
         |        FROM c) sg,
         |      LATERAL (SELECT LEAST(off + n_tokens, (win + 1) * $ctxLen) -
         |        GREATEST(off, win * $ctxLen) AS l) lx
         |    GROUP BY win))""".stripMargin
    s"""WITH d AS (SELECT doc_id,
       |    CAST(len([x for x in string_split_regex(lower(text),
       |      '[^a-z0-9]+') if len(x) > 0]) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS off
       |  FROM d WHERE n_tokens > 0)
       |${ctxLens.map(leg).mkString("\nUNION ALL\n")}
       |ORDER BY ctx_len""".stripMargin
  }

  /** DuckDB oracle for [[packContamination]]. */
  def packContaminationSql(ctxLen: Long = 2048L): String =
    s"""WITH d AS (SELECT doc_id,
       |    CAST(len([x for x in string_split_regex(lower(text),
       |      '[^a-z0-9]+') if len(x) > 0]) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS off
       |  FROM d WHERE n_tokens > 0),
       |sg AS (SELECT unnest(generate_series(off // $ctxLen,
       |      (off + n_tokens - 1) // $ctxLen)) AS win, off, n_tokens
       |  FROM c),
       |sl AS (SELECT win,
       |    LEAST(off + n_tokens, (win + 1) * $ctxLen) -
       |      GREATEST(off, win * $ctxLen) AS l
       |  FROM sg),
       |w AS (SELECT win, CAST(COUNT(*) AS BIGINT) AS m,
       |    CAST(SUM(l) AS BIGINT) AS t,
       |    CAST(SUM(l * l) AS BIGINT) AS sl2
       |  FROM sl GROUP BY 1),
       |cw AS (SELECT win, m, t, CASE WHEN t <= 1 THEN 0
       |    ELSE (t * t - sl2) * 1000000 // (t * (t - 1)) END AS contam_ppm
       |  FROM w)
       |SELECT m AS docs_per_window, CAST(COUNT(*) AS BIGINT) AS n_windows,
       |  CAST(SUM(t) AS BIGINT) AS tokens,
       |  CAST(SUM(contam_ppm) // COUNT(*) AS BIGINT) AS mean_contam_ppm
       |FROM cw GROUP BY 1 ORDER BY 1""".stripMargin
}
