package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{PortableHash, Text}

/** Corpus-curation operators a large-scale training-data pipeline needs on
  * top of dedup/quality: benchmark decontamination, stratified sampling,
  * and domain (source) mixture planning.
  *
  * All three follow the repo's portability convention: every hash/bucket
  * decision is a [[PortableHash.h60]] of CONTENT (bit-identical in DuckDB),
  * and every fractional quantity is integer arithmetic (ppm), so the
  * DuckDB oracle hash-matches exactly — no rtol anywhere.
  */
object Curation {

  /** Shared per-document feature artifact (VERDICT r6 "what's wrong" #3):
    * ONE corpus pass computes every SCALAR doc-level feature the curation
    * family consumes — content hash (and its %100 split bucket), the
    * tokenizer token count, the whitespace token count (q58's declared
    * definition — a DIFFERENT tokenization kept verbatim), and the
    * alphabetic ratio. Eagerly localCheckpoint'd and memoized per
    * (session, dir) — the `sharedClusters` pattern — so q56/q57/q58/q59/
    * q62 read the materialized artifact instead of re-tokenizing the
    * corpus per consumer. Deliberately scalar-only: storing the token
    * ARRAY would make the artifact corpus-sized and its materialization
    * as expensive as the tokenization it saves (A/B-measured at sf0.1 —
    * flat); the one remaining tokenization of `text` is decontaminate's
    * gram pass, which needs the tokens themselves. At 100 TB this is the
    * doc-stats table a production pipeline materializes once per corpus
    * snapshot and fans every curation stage out from. */
  def docFeatures(s: SparkSession, dir: String): DataFrame = {
    val perSession = featureCache.synchronized {
      var m = featureCache.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        featureCache.put(s, m)
      }
      m
    }
    perSession.computeIfAbsent(dir, _ =>
      docFeaturesOf(Tables.load(s, dir, "documents"),
        passthrough = Seq("lang", "source", "n_chars"))
        .transform(PinExplain.pin))
  }

  /** The feature computation itself, over ANY (doc_id, text, …) frame —
    * the per-micro-batch entry point of the streaming curation twin
    * (per-doc features are batch-local by construction). */
  def docFeaturesOf(docs: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    val h = PortableHash.h60(col("text"))
    docs.select(Seq(col("doc_id")) ++ passthrough.map(col) ++ Seq(
      h.as("h"), (h % 100).as("bucket"),
      size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
      size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
        .cast("long").as("n_ws_tokens"),
      round(length(regexp_replace(lower(col("text")), "[^a-z]", ""))
        .cast("double") / length(col("text")).cast("double"), 6)
        .as("alpha_ratio"),
      // integer twin of alpha_ratio (ppm, floor) — the total-order
      // quality key q177 sorts the corpus by; kept integer so the
      // global ordering is engine-portable with no float ties
      when(length(col("text")) === 0, 0L)
        .otherwise(expr("length(regexp_replace(lower(text), '[^a-z]', ''))" +
          " * CAST(1000000 AS BIGINT) div length(text)"))
        .as("alpha_ppm")): _*)
  }

  private val featureCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]]()

  def clearFeatureCache(): Unit =
    featureCache.synchronized(featureCache.clear())

  /** Persisted doc-features checkpoint: the on-disk form of the
    * [[docFeatures]] artifact, refreshed incrementally as the corpus
    * grows. Each refresh computes features ONLY for doc_ids not already
    * in the store (anti-join against the store's pruned doc_id column)
    * and appends them — per-refresh cost is O(new docs), never
    * O(corpus), the same reference-side persistence contract as
    * `Dedup.incrementalDedup`'s signature table. Re-delivering an
    * already-ingested batch appends nothing, so upstream at-least-once
    * delivery cannot duplicate feature rows. At 100 TB the store is the
    * doc-stats table every curation stage fans out from; partition the
    * parquet by `bucket` and the anti-join prunes to touched buckets.
    * Returns the refreshed store as a frame. */
  def refreshFeatureStore(s: SparkSession, path: String, docs: DataFrame,
      passthrough: Seq[String] = Seq("lang", "source", "n_chars")): DataFrame = {
    val hasStore = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
    }
    val fresh =
      if (!hasStore) docs
      else docs.join(s.read.parquet(path).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    docFeaturesOf(fresh, passthrough)
      .write.mode("append").parquet(path)
    s.read.parquet(path)
  }

  /** q90: corpus snapshot diff — the dataset-versioning audit run before
    * promoting a new corpus release: FULL OUTER join of two snapshots on
    * doc_id, each doc classified added / removed / changed / unchanged by
    * comparing content hashes (h60 of text — in production both sides
    * read the persisted [[refreshFeatureStore]] hash column and the text
    * is never rescanned). Snapshots are derived deterministically from
    * the one test corpus: old = doc_id%100 < 90 as-is; new = doc_id%100
    * ≥ 10, with docs in [40,50) carrying revised text — so every class is
    * populated and the classification is a pure function of the data.
    *
    * Scale design: ONE co-partitioned doc_id shuffle joins (doc_id, hash)
    * pairs — the full-outer compare never moves text. */
  def corpusDiff(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), expr("doc_id % 100").as("m"))
    val prev = d.filter(col("m") < 90)
      .select(col("doc_id"), PortableHash.h60(col("text")).as("h_old"))
    val next = d.filter(col("m") >= 10)
      .select(col("doc_id"), PortableHash.h60(
        when(col("m").between(40, 49), concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("h_new"))
    diffClasses(prev, next)
  }

  /** q138: anti-entropy bucket-digest diff — the MERKLE-STYLE scale path
    * q90's full-corpus diff lacks. Comparing two 100 TB snapshots key by
    * key shuffles both corpora; the Dynamo/Cassandra repair trick
    * compares B per-bucket DIGESTS first (metadata scale) and re-reads
    * only the buckets whose digests disagree. Digest = (count,
    * bit_xor(row-hash)) per bucket — both order-free, partial-agg
    * friendly, engine-portable (the Dedup convergence-signature
    * convention); a digest collision needs a bit_xor coincidence AND an
    * equal count, and the row-hash is 60 bits. The drill stage joins
    * ONLY the dirty buckets' keys (a broadcast semi-join on bucket id),
    * then classifies exactly like q90 — DigestDiffSpec proves the
    * drilled classification equals the full diff while touching a
    * fraction of the keys.
    *
    * The change profile is deliberately SPARSE (1% changed, 1% added,
    * 1% removed) — the regime where anti-entropy pays: dirty buckets ≪
    * B, so the drill reads a few percent of the corpus. */
  def digestDiff(s: SparkSession, dir: String, buckets: Int = 1024): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), expr("doc_id % 100").as("m"))
    val prev = d.filter(col("m") =!= 99)
      .select(col("doc_id"), PortableHash.h60(col("text")).as("h"))
    val next = d.filter(col("m") =!= 0)
      .select(col("doc_id"), PortableHash.h60(
        when(col("m") === 42, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("h"))
    def withBucket(df: DataFrame): DataFrame = df.withColumn("bucket",
      PortableHash.h60(col("doc_id").cast("string")) % buckets)
    def digest(df: DataFrame): DataFrame = withBucket(df)
      .withColumn("rowh",
        PortableHash.h60(concat(col("doc_id").cast("string"), lit(":"),
          col("h").cast("string"))))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(rowh)").as("x"))
    val dirty = digest(prev).withColumnRenamed("n", "na")
      .withColumnRenamed("x", "xa")
      .join(digest(next).withColumnRenamed("n", "nb")
        .withColumnRenamed("x", "xb"), Seq("bucket"), "full_outer")
      .filter(col("na").isNull || col("nb").isNull ||
        col("na") =!= col("nb") || col("xa") =!= col("xb"))
      .select(col("bucket"))
    val pd = withBucket(prev).join(broadcast(dirty), Seq("bucket"), "left_semi")
    val nd = withBucket(next).join(broadcast(dirty), Seq("bucket"), "left_semi")
    pd.withColumnRenamed("h", "h_old")
      .join(nd.withColumnRenamed("h", "h_new"), Seq("bucket", "doc_id"),
        "full_outer")
      .select(col("doc_id"), col("bucket"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("change_class"))
      .filter(col("change_class") =!= "unchanged")
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[digestDiff]]. */
  def digestDiffSql(buckets: Int = 1024): String = {
    val hDoc = PortableHash.h60Sql("CAST(doc_id AS VARCHAR)")
    val rowH = PortableHash.h60Sql(
      "CAST(doc_id AS VARCHAR) || ':' || CAST(h AS VARCHAR)")
    s"""WITH d AS (SELECT doc_id, text, doc_id % 100 AS m FROM documents),
       |prev AS MATERIALIZED (SELECT doc_id,
       |    ${PortableHash.h60Sql("text")} AS h,
       |    ($hDoc) % $buckets AS bucket
       |  FROM d WHERE m <> 99),
       |next AS MATERIALIZED (SELECT doc_id,
       |    ${PortableHash.h60Sql(
             "CASE WHEN m = 42 THEN text || ' rev2' ELSE text END")} AS h,
       |    ($hDoc) % $buckets AS bucket
       |  FROM d WHERE m <> 0),
       |da AS (SELECT bucket, COUNT(*) AS na, bit_xor($rowH) AS xa
       |  FROM prev GROUP BY 1),
       |db AS (SELECT bucket, COUNT(*) AS nb, bit_xor($rowH) AS xb
       |  FROM next GROUP BY 1),
       |dirty AS (SELECT bucket FROM da FULL OUTER JOIN db USING (bucket)
       |  WHERE na IS NULL OR nb IS NULL OR na <> nb OR xa <> xb),
       |pd AS (SELECT p.* FROM prev p SEMI JOIN dirty USING (bucket)),
       |nd AS (SELECT n.* FROM next n SEMI JOIN dirty USING (bucket))
       |SELECT doc_id, bucket,
       |  CASE WHEN pd.h IS NULL THEN 'added'
       |       WHEN nd.h IS NULL THEN 'removed'
       |       ELSE 'changed' END AS change_class
       |FROM pd FULL OUTER JOIN nd USING (bucket, doc_id)
       |WHERE pd.h IS NULL OR nd.h IS NULL OR pd.h <> nd.h
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared diff stage: classify `(doc_id, h_old)` vs `(doc_id, h_new)`
    * snapshots into the 4-class summary. Batch q90 and the streaming twin
    * ([[graft.streaming.DiffStream]]) both end in THIS stage, so streamed
    * == batch is structural, not coincidental. */
  def diffClasses(prev: DataFrame, next: DataFrame): DataFrame =
    prev.join(next, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("change_class"))
      .groupBy(col("change_class"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("change_class"))

  /** Benchmark decontamination (q56): flag train/val documents that share
    * at least one distinct 13-token n-gram with any test-split document —
    * the canonical overlap rule used to scrub eval contamination from
    * training corpora. The split is the same content-hash assignment as
    * q47 (`Dedup.splitAssign`), so exact duplicates of a test doc are
    * always flagged (they carry identical grams).
    *
    * Scale design (100 TB corpus, benchmark-sized eval set): the test-side
    * distinct gram set is eval-sized (≪ corpus), so it BROADCASTS; the
    * train side is a scan + explode + broadcast-hash semi-join — the only
    * shuffle is the per-doc hit count over join survivors (tiny). Grams
    * travel as 60-bit content hashes, never as strings.
    */
  /** `ordered = false` skips the doc_id presentation sort for consumers
    * that join/aggregate the flag set (q59/q62's curationFlags, q194) —
    * a dead range exchange + sampling job there (guide §2.4). */
  def decontaminate(s: SparkSession, dir: String, n: Int = 13,
                    ordered: Boolean = true): DataFrame = {
    // tokens MUST be bound to an attribute before the explode: handed
    // straight to the generator, CollapseProject inlines the tokenizer
    // into every element_at of the shingle lambda — n+2 re-tokenizations
    // per shingle position (measured 14× slower at n=13).
    //
    // The broadcast (test) side and the probe (train/val) side are two
    // separate corpus passes — the scale-correct trade vs shuffling the
    // full gram table by hash — but each side filters its split bucket
    // BEFORE tokenizing, so across both passes every document is
    // tokenized and shingled exactly once (10% + 90%, disjoint). This is
    // the curation family's one legitimate tokenization of `text`; the
    // count/ratio features come from the docFeatures artifact.
    val base = bucketedText(s, dir)
    contaminationHits(base.filter(col("bucket") < 90),
        testGramSet(s, dir, n), n)
      .select(col("doc_id"),
        when(col("bucket") < 80, "train").otherwise("val").as("split"),
        col("n_hits"))
      .transform(df => if (ordered) df.orderBy(col("doc_id")) else df)
  }

  private def bucketedText(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        (PortableHash.h60(col("text")) % 100).as("bucket"), col("text"))

  /** Distinct 60-bit gram hashes over a (doc_id, bucket, text) frame. */
  def gramHashes(docs: DataFrame, n: Int = 13): DataFrame = docs
    .select(col("doc_id"), col("bucket"), Text.tokens(col("text")).as("toks"))
    .select(col("doc_id"), col("bucket"),
      explode(Text.shingles(col("toks"), n)).as("sh"))
    .select(col("doc_id"), col("bucket"), PortableHash.h60(col("sh")).as("gh"))

  /** The eval-side gram artifact: distinct gram hashes of the test split.
    * Eval-sized, persisted once per benchmark release in production —
    * the streaming curation twin reads it from disk per micro-batch. */
  def testGramSet(s: SparkSession, dir: String, n: Int = 13): DataFrame =
    gramHashes(bucketedText(s, dir).filter(col("bucket") >= 90), n)
      .select(col("gh")).distinct()

  /** Per-doc contamination hits of `docs` (doc_id, bucket, text) against
    * a given eval gram set — batch-local given the artifact, which is why
    * the streaming twin can run it per micro-batch unchanged. */
  def contaminationHits(docs: DataFrame, testGrams: DataFrame,
                        n: Int = 13): DataFrame =
    gramHashes(docs, n)
      .join(broadcast(testGrams), "gh")
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count_distinct(col("gh")).as("n_hits"))

  /** Per-stratum quota sampling (q57): keep the `k` documents with the
    * smallest content hash within each language — a deterministic,
    * re-shard-stable "random" sample with an exact per-stratum quota.
    *
    * Scale design: a naive `row_number() OVER (PARTITION BY lang)` funnels
    * each stratum through ONE reducer — a scale-killer when a stratum is
    * billions of rows. Instead: (1) aggregate per-stratum counts
    * (broadcast-sized — one row per language); (2) prefilter with a
    * conservative hash threshold ~ safety·k/n of the 2^60 hash space, which
    * keeps ~safety·k rows per stratum at any corpus size; (3) rank only the
    * survivors. The prefilter is checked, not trusted: if any stratum came
    * up short of its quota (possible only for adversarial hash
    * distributions), fall back to exact ranking for a correctness
    * guarantee.
    */
  def stratifiedSample(s: SparkSession, dir: String, k: Int = 40): DataFrame = {
    val docs = docFeatures(s, dir).select(col("doc_id"), col("lang"), col("h"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    def rank(base: DataFrame): DataFrame = base
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("rk"))

    val sk = 4L * k // safety × quota: expected prefilter survivors/stratum
    // one row per language — checkpointed so the audit below doesn't
    // rescan the corpus
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_g")).transform(PinExplain.pin)
    // conservative threshold ≥ 2^60·sk/n_g, computed without overflowing
    // a Long (2^60·sk would): h60 is uniform on [0, 2^60)
    val thresholds = counts.select(col("lang"), expr(
      s"CASE WHEN n_g <= $sk THEN ${1L << 60}" +
        s" ELSE ((${1L << 60} DIV n_g) + 1) * $sk END").as("thresh"))
    val survivors = docs.join(broadcast(thresholds), "lang")
      .filter(col("h") < col("thresh"))
      .select(col("doc_id"), col("lang"), col("h"))
      .transform(PinExplain.pin)
    val sampled = rank(survivors)
    // quota audit: every stratum must deliver min(k, n_g) rows; a short
    // stratum means the prefilter bit — rerank exactly (rare path, only
    // reachable for adversarial hash distributions)
    val short = sampled.groupBy(col("lang")).agg(count(lit(1)).as("got"))
      .join(counts, "lang")
      .filter(col("got") < least(lit(k.toLong), col("n_g")))
      .limit(1).count() > 0
    val result = if (short) rank(docs) else sampled
    result.orderBy(col("lang"), col("rk"))
  }

  /** Domain-mixture planning (q58): given a token budget and per-source
    * target weights, compute how many epochs each document contributes to
    * the mixed training corpus. `rate = budget·w_s / tokens_s` is carried
    * in ppm (integer arithmetic, engine-portable); the integer part is a
    * whole-corpus repetition and the fractional part is realized by a
    * deterministic content-hash Bernoulli (`h60(text) % 1M < frac_ppm`) —
    * so the REALIZED token count concentrates on the target with zero
    * randomness across runs or engines.
    *
    * Scale design: per-source token totals are a 20-row map-side-combined
    * aggregate, broadcast back onto the corpus scan; the doc-level pass is
    * scan-speed with no shuffle.
    */
  def domainMix(s: SparkSession, dir: String,
                budgetTokens: Long = 100000L): DataFrame = {
    import s.implicits._
    val weights = domainWeights
    val sumW = weights.map(_._2).sum
    val wDf = weights.toDF("source", "w")

    val docs = docFeatures(s, dir)
      .select(col("doc_id"), col("source"),
        col("n_ws_tokens").as("n_tokens"), // q58's declared ws tokenization
        (col("h") % 1000000L).as("hmod"))
    // DIV keeps every step in exact integer arithmetic (Spark's `/` on
    // longs is double division — not oracle-portable at the margins)
    val rates = docs.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tokens_s"))
      .join(wDf, "source")
      .select(col("source"), expr(
        s"(($budgetTokens * w DIV $sumW) * 1000000) DIV tokens_s")
        .as("rate_ppm"))
    docs.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (expr("rate_ppm DIV 1000000") +
          when(col("hmod") < col("rate_ppm") % 1000000L, 1L).otherwise(0L))
          .as("n_epochs"))
      .orderBy(col("doc_id"))
  }

  /** Relative target weights per source — deterministic, declared here and
    * mirrored literally in the oracle VALUES list. */
  val domainWeights: Vector[(String, Long)] =
    (0 until 20).map(i => (s"src$i", (i % 4 + 1).toLong)).toVector

  /** Per-language document-length quantiles via the bounded-state
    * [[graft.functions.KmvQuantile]] sketch (q60): p50/p90/p99 of the
    * distinct n_chars domain from a deterministic bottom-k-by-hash sample.
    * The exact-percentile twin is q34; this is the O(k)-state form whose
    * shuffle carries ≤ k (hash, value) pairs per (group, partition) — and
    * unlike approx_percentile it is bit-verifiable by the oracle. */
  def lenQuantiles(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val agg = graft.functions.KmvQuantile.columnAgg(k)
    Tables.load(s, dir, "documents")
      .select(col("lang"),
        PortableHash.h60(col("n_chars").cast("string")).as("h"),
        col("n_chars").as("v"))
      .groupBy(col("lang"))
      .agg(agg(col("h"), col("v")).as("q"))
      .select(col("lang"), col("q._1").as("p50"),
        col("q._2").as("p90"), col("q._3").as("p99"))
      .orderBy(col("lang"))
  }

  /** Curation funnel (q59): the end-to-end corpus attrition report —
    * docs/tokens surviving each pipeline stage, cumulatively:
    * 1 `all`, 2 `quality` (≥10 tokens and ≥50% alphabetic), 3 `dedup`
    * (near-dup cluster roots only, q48/q49's shared clustering),
    * 4 `train_clean` (train split, not 13-gram-contaminated vs the test
    * split). One row per stage — the one-glance summary a pipeline
    * operator tracks release over release.
    *
    * Scale design: each doc is tagged with boolean stage flags in ONE
    * corpus pass (the dup and contamination sets join in without hints —
    * AQE broadcasts them while they're small, shuffles when they're not),
    * then a single 8-aggregate reduce + `stack` unpivots into 4 rows. No
    * per-stage rescans. */
  /** Per-doc stage flags shared by the funnel (q59) and the curated packed
    * corpus (q62): `pq` quality, `kept` dedup survivor, `clean` train-split
    * and uncontaminated. One corpus pass plus two small joins. */
  def curationFlags(s: SparkSession, dir: String): DataFrame = {
    // the feature artifact and the q48 clustering are independent EAGER
    // builds (each pins); build them concurrently so the flags cost
    // max(leg), not sum (guide §2.6). decontaminate stays lazy — its
    // stages already overlap inside the caller's one action.
    val (feats, clusters) =
      Par.par2(docFeatures(s, dir), Dedup.sharedClusters(s, dir))
    val docs = feats
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("alpha_ratio"))
    val dups = clusters
      .filter(col("cluster") =!= col("doc_id"))
      .select(col("doc_id"), lit(true).as("is_dup"))
    val contam = decontaminate(s, dir, ordered = false)
      .select(col("doc_id"), lit(true).as("is_contam"))
    curationFlagsFrom(docs, dups, contam)
  }

  /** Flag computation over explicit inputs — `feats` per-doc scalars
    * (doc_id, bucket, n_tokens, alpha_ratio), `dups` (doc_id, is_dup) and
    * `contam` (doc_id, is_contam) reference artifacts. Per-doc given the
    * artifacts, so the streaming twin calls this per micro-batch with the
    * batch's features against PERSISTED dup/contamination sets and gets
    * bitwise the batch flags. */
  def curationFlagsFrom(feats: DataFrame, dups: DataFrame,
                        contam: DataFrame): DataFrame =
    feats
      .join(dups, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") >= 10 && col("alpha_ratio") >= 0.5).as("pq"),
        (coalesce(col("is_dup"), lit(false)) === false).as("kept"),
        (col("bucket") < 80 &&
          coalesce(col("is_contam"), lit(false)) === false).as("clean"))

  def curationFunnel(s: SparkSession, dir: String): DataFrame =
    funnelOf(curationFlags(s, dir))

  /** The 4-stage attrition report over any flag frame. The 8 aggregates
    * are algebraic sums, so per-micro-batch partials combine exactly —
    * the streaming twin sums its per-batch funnel rows and matches the
    * batch report bit-for-bit. */
  def funnelOf(flags: DataFrame): DataFrame = {
    def cnt(p: Column) = sum(when(p, 1L).otherwise(0L))
    def tok(p: Column) = sum(when(p, col("n_tokens")).otherwise(0L))
    flags.agg(
        cnt(lit(true)).as("c1"), tok(lit(true)).as("t1"),
        cnt(col("pq")).as("c2"), tok(col("pq")).as("t2"),
        cnt(col("pq") && col("kept")).as("c3"),
        tok(col("pq") && col("kept")).as("t3"),
        cnt(col("pq") && col("kept") && col("clean")).as("c4"),
        tok(col("pq") && col("kept") && col("clean")).as("t4"))
      .selectExpr("""stack(4,
        1, 'all', c1, t1,
        2, 'quality', c2, t2,
        3, 'dedup', c3, t3,
        4, 'train_clean', c4, t4) AS (stage_idx, stage, n_docs, n_tokens)""")
      .orderBy(col("stage_idx"))
  }

  /** q170: WINNOW-fingerprint decontamination — the paraphrase-robust
    * sibling of q56: a training document is flagged when ≥ `minHits` of
    * its winnowing fingerprints (q43's k=3/w=4 scheme) appear in the
    * test split's fingerprint set. q56's exact-13-gram rule breaks on a
    * single character edit anywhere in the gram; winnowing fingerprints
    * are window minima, so edits away from the selected minima leave
    * them intact — the screen that still fires when eval text was
    * lightly reworded into the crawl (Schleimer et al.'s robustness
    * property, applied to decontamination). Reports hit density per
    * flagged doc in integer ppm.
    *
    * Scale: fingerprints are 60-bit longs; the test-side set is
    * eval-sized and broadcasts; the corpus side is the q43 winnow scan
    * plus one doc-keyed count — the q56 shuffle shape exactly. */
  def winnowDecontaminate(s: SparkSession, dir: String,
                          minHits: Int = 2,
                          ordered: Boolean = true): DataFrame = {
    val buckets = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        (PortableHash.h60(col("text")) % 100).as("bucket"))
    val fps = Dedup.winnowFingerprints(s, dir)
      .join(buckets, "doc_id")
      .persist()
    val testFps = fps.filter(col("bucket") >= 90)
      .select(col("fp")).distinct()
    val probe = fps.filter(col("bucket") < 90)
    val out = probe
      .join(broadcast(testFps), Seq("fp"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .join(probe.groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("n_fp")), "doc_id")
      .filter(col("n_hits") >= minHits)
      .select(col("doc_id"),
        when(col("bucket") < 80, "train").otherwise("val").as("split"),
        col("n_fp"), col("n_hits"),
        expr("n_hits * 1000000 div n_fp").as("hit_ppm"))
      .transform(df => if (ordered) df.orderBy(col("doc_id")) else df)
    Dedup.pinAndRelease(out, fps)
  }

  /** q171: TEMPERATURE-scaled language mixture (the mT5/Llama balancing
    * rule at α = 1/2): per-language sampling weights ∝ n_tokens^α, so
    * low-resource languages are up-weighted relative to their raw share
    * without declared constants (q58 plans against DECLARED weights;
    * this derives them from the data). Per language: raw vs tempered
    * share, the per-doc inclusion rate that realizes the tempered
    * mixture at constant total token budget (integer epochs + a
    * fractional part realized by the q58 content-hash Bernoulli), and
    * the REALIZED document/token counts under that rule — deterministic,
    * so the plan and its realization are both hash-gated.
    *
    * Portability: n^(1/2) is floor(sqrt(double)) — IEEE sqrt is
    * correctly rounded in both engines, so even the k²−1 boundary cases
    * round identically; everything else is BIGINT div/mod. At corpus
    * sizes past 2^52 tokens widen through DECIMAL as q134 documents.
    *
    * Scale: one scan to per-language totals (map-side combined), the
    * 5-row rate table broadcast back onto a second scan-speed pass. */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("lang"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
        (PortableHash.h60(col("text")) % 1000000L).as("hmod"))
      .transform(PinExplain.pin) // feeds the totals AND the realization pass
    val totals = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_toks"))
      .withColumn("w", expr("CAST(floor(sqrt(CAST(n_toks AS DOUBLE))) AS BIGINT)"))
    val sums = totals.agg(sum(col("n_toks")).as("tot"), sum(col("w")).as("sw"))
    // Zero-denominator guards (ANSI mode throws DIVIDE_BY_ZERO): a
    // language whose documents all tokenize to empty under the
    // [^a-z0-9]+ tokenizer (any non-Latin-script language) has
    // n_toks = 0, and an all-empty corpus has tot = sw = 0. Such a
    // language contributes no token budget, so every ppm is 0 for it —
    // same CASE guards as q163/q166.
    val rates = totals.crossJoin(broadcast(sums))
      .select(col("lang"), col("n_docs"), col("n_toks"),
        expr("CASE WHEN tot = 0 THEN 0 ELSE n_toks * 1000000 div tot END")
          .as("raw_ppm"),
        expr("CASE WHEN sw = 0 THEN 0 ELSE w * 1000000 div sw END")
          .as("temp_ppm"),
        expr("CASE WHEN sw = 0 OR n_toks = 0 THEN 0" +
          " ELSE (w * 1000000 div sw) * tot div n_toks END")
          .as("rate_ppm"))
    docs.join(broadcast(rates.select(col("lang"), col("rate_ppm"))), "lang")
      .withColumn("keep",
        expr("rate_ppm div 1000000") +
          when(col("hmod") < col("rate_ppm") % 1000000L, 1L).otherwise(0L))
      .groupBy(col("lang"))
      .agg(sum(col("keep")).as("realized_docs"),
        sum(col("keep") * col("n_tokens")).as("realized_tokens"))
      .join(rates, "lang")
      .select(col("lang"), col("n_docs"), col("n_toks"), col("raw_ppm"),
        col("temp_ppm"), col("rate_ppm"), col("realized_docs"),
        col("realized_tokens"))
      .orderBy(col("lang"))
  }

  /** DuckDB oracle for [[temperatureMix]]. */
  val temperatureMixSql: String = {
    val h = PortableHash.h60Sql("text")
    s"""WITH d AS (SELECT lang,
       |    CAST(len([x for x in string_split_regex(lower(text),
       |      '[^a-z0-9]+') if len(x) > 0]) AS BIGINT) AS n_tokens,
       |    ($h) % 1000000 AS hmod
       |  FROM documents),
       |t AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_tokens) AS BIGINT) AS n_toks,
       |    CAST(floor(sqrt(CAST(SUM(n_tokens) AS DOUBLE))) AS BIGINT) AS w
       |  FROM d GROUP BY 1),
       |s AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS tot,
       |    CAST(SUM(w) AS BIGINT) AS sw FROM t),
       |r AS (SELECT lang, n_docs, n_toks,
       |    CASE WHEN tot = 0 THEN 0
       |      ELSE n_toks * 1000000 // tot END AS raw_ppm,
       |    CASE WHEN sw = 0 THEN 0
       |      ELSE w * 1000000 // sw END AS temp_ppm,
       |    CASE WHEN sw = 0 OR n_toks = 0 THEN 0
       |      ELSE (w * 1000000 // sw) * tot // n_toks END AS rate_ppm
       |  FROM t CROSS JOIN s),
       |k AS (SELECT d.lang,
       |    CAST(SUM(r.rate_ppm // 1000000 +
       |      CASE WHEN d.hmod < r.rate_ppm % 1000000 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS realized_docs,
       |    CAST(SUM((r.rate_ppm // 1000000 +
       |      CASE WHEN d.hmod < r.rate_ppm % 1000000 THEN 1 ELSE 0 END)
       |      * d.n_tokens) AS BIGINT) AS realized_tokens
       |  FROM d JOIN r USING (lang) GROUP BY 1)
       |SELECT r.lang, r.n_docs, r.n_toks, r.raw_ppm, r.temp_ppm,
       |  r.rate_ppm, k.realized_docs, k.realized_tokens
       |FROM r JOIN k USING (lang) ORDER BY r.lang""".stripMargin
  }

  /** q177: token-BUDGET-constrained corpus selection — the "best docs
    * until the budget runs out" cut every fixed-compute pretraining run
    * makes (given B training tokens, take the highest-quality documents
    * whose cumulative token count fits): corpus totally ordered by
    * (alpha_ppm DESC, doc_id), running token sum along that order, docs
    * with cum ≤ B selected, B = total tokens div `budgetDiv`. The report
    * is the per-(lang, source) composition of the selected set against
    * the full corpus — the table that shows WHAT a pure quality-ranked
    * cut does to language/source balance (it starves low-alpha
    * languages; q171's temperature rule is the counter-measure, and this
    * query is how you SEE the tension).
    *
    * Determinism: the quality key is the INTEGER alpha_ppm from the
    * shared [[docFeatures]] artifact and doc_id breaks ties, so the
    * selection set is a pure function of the data in both engines.
    *
    * Scale: the global running sum is [[Ranks.globalRunningSum]] — range
    * partition on the sort key, per-partition sums, prefix offsets over
    * the partition-count-sized table, ONE window inside each partition
    * (the Terasort construction; no single-reducer global window). The
    * budget is one broadcast scalar. Everything downstream of the
    * artifact touches (doc_id, lang, source, two longs) — never text. */
  def tokenBudgetSelect(s: SparkSession, dir: String,
                        budgetDiv: Long = 5L): DataFrame = {
    val f = docFeatures(s, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_tokens"), col("alpha_ppm"),
        (-col("alpha_ppm")).as("ord"))
    val budget = f.agg(expr(s"sum(n_tokens) div $budgetDiv").as("budget"))
    val cum = Ranks.globalRunningSum(f, Nil, Seq("ord", "doc_id"),
      "n_tokens", out = "cum")
    cum.crossJoin(broadcast(budget))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("toks"),
        sum(when(col("cum") <= col("budget"), 1L).otherwise(0L))
          .as("n_docs_sel"),
        sum(when(col("cum") <= col("budget"), col("n_tokens"))
          .otherwise(0L)).as("toks_sel"),
        max(col("budget")).as("budget"))
      .select(col("lang"), col("source"), col("n_docs"), col("toks"),
        col("n_docs_sel"), col("toks_sel"),
        expr("CASE WHEN budget = 0 THEN 0" +
          " ELSE toks_sel * 1000000 div budget END").as("budget_ppm"))
      .orderBy(col("lang"), col("source"))
  }

  /** DuckDB oracle for [[tokenBudgetSelect]] (plain window running sum —
    * the semantics; the Spark side's range-partitioned construction must
    * reproduce it exactly). */
  def tokenBudgetSelectSql(budgetDiv: Long = 5L): String =
    s"""WITH f AS (SELECT doc_id, lang, source,
       |    CAST(len([x for x in string_split_regex(lower(text),
       |      '[^a-z0-9]+') if len(x) > 0]) AS BIGINT) AS n_tokens,
       |    CASE WHEN length(text) = 0 THEN 0
       |      ELSE CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
       |        AS BIGINT) * 1000000 // length(text) END AS alpha_ppm
       |  FROM documents),
       |b AS (SELECT CAST(SUM(n_tokens) // $budgetDiv AS BIGINT) AS budget
       |  FROM f),
       |c AS (SELECT *, SUM(n_tokens) OVER (ORDER BY alpha_ppm DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM f)
       |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS toks,
       |  CAST(SUM(CASE WHEN cum <= budget THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_sel,
       |  CAST(SUM(CASE WHEN cum <= budget THEN n_tokens ELSE 0 END)
       |    AS BIGINT) AS toks_sel,
       |  CASE WHEN MAX(budget) = 0 THEN 0
       |    ELSE CAST(SUM(CASE WHEN cum <= budget THEN n_tokens ELSE 0 END)
       |      AS BIGINT) * 1000000 // MAX(budget) END AS budget_ppm
       |FROM c CROSS JOIN b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q181: per-RULE quality-filter attrition (the Gopher/C4 rule-cascade
    * diagnostic): five independent integer-exact quality rules —
    * `length` (10 ≤ tokens ≤ 100000), `mean_word_len` (mean token length
    * in [3, 10] chars, ppm), `alpha` (≥ 50% alphabetic), `stopword`
    * (≥ 2 distinct stopwords), `repetition` (top unigram ≤ 20% of
    * tokens) — each reported with its fail count, fail ppm, and its
    * UNIQUE-fail count (docs failing ONLY that rule), plus an `any` row.
    * q59 says how much survives the cascade; this says which rule does
    * the work — the number you read before loosening or dropping a
    * filter (a rule with many fails but near-zero unique fails is
    * redundant with the rest of the cascade).
    *
    * Zero-token docs fail `length` (and `stopword`) but are defined NOT
    * to additionally fail the token-statistic rules (mean/repetition) —
    * CASE-guarded in both engines, so ANSI mode cannot divide by zero.
    *
    * Scale: the per-doc scalars ride the shared [[docFeatures]]
    * artifact; the three token-statistic scalars come from ONE
    * explode → (doc, token) count → per-doc aggregate chain (scan-shaped,
    * map-side combined); the report is a single 13-aggregate reduce
    * unpivoted metadata-side. */
  def ruleAttrition(s: SparkSession, dir: String): DataFrame = {
    val stops = TextQueries.stopwords.values.flatten.toSeq.distinct
    val base = docFeatures(s, dir)
      .select(col("doc_id"), col("n_tokens"), col("alpha_ppm"))
    val tokStats = Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * length(col("tok")).cast("long")).as("tchars"),
        max(col("c")).as("topc"),
        sum(when(col("tok").isInCollection(stops), 1L).otherwise(0L))
          .as("nstop"))
    val flags = base.join(tokStats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_tokens") < 10 || col("n_tokens") > 100000).as("f_len"),
        expr("CASE WHEN n_tokens = 0 THEN false ELSE " +
          "tchars * 1000000 div n_tokens < 3000000 OR " +
          "tchars * 1000000 div n_tokens > 10000000 END").as("f_mean"),
        (col("alpha_ppm") < 500000L).as("f_alpha"),
        (coalesce(col("nstop"), lit(0L)) < 2L).as("f_stop"),
        expr("CASE WHEN n_tokens = 0 THEN false ELSE " +
          "topc * 1000000 div n_tokens > 200000 END").as("f_rep"))
      .withColumn("nf",
        expr("CASE WHEN f_len THEN 1 ELSE 0 END + " +
          "CASE WHEN f_mean THEN 1 ELSE 0 END + " +
          "CASE WHEN f_alpha THEN 1 ELSE 0 END + " +
          "CASE WHEN f_stop THEN 1 ELSE 0 END + " +
          "CASE WHEN f_rep THEN 1 ELSE 0 END"))
    def cnt(p: Column) = sum(when(p, 1L).otherwise(0L))
    val agg = flags.agg(
      count(lit(1)).as("n_docs"),
      cnt(col("f_len")).as("len_f"),
      cnt(col("f_len") && col("nf") === 1).as("len_u"),
      cnt(col("f_mean")).as("mean_f"),
      cnt(col("f_mean") && col("nf") === 1).as("mean_u"),
      cnt(col("f_alpha")).as("alpha_f"),
      cnt(col("f_alpha") && col("nf") === 1).as("alpha_u"),
      cnt(col("f_stop")).as("stop_f"),
      cnt(col("f_stop") && col("nf") === 1).as("stop_u"),
      cnt(col("f_rep")).as("rep_f"),
      cnt(col("f_rep") && col("nf") === 1).as("rep_u"),
      cnt(col("nf") > 0).as("any_f"),
      cnt(col("nf") === 1).as("any_u"))
    agg.select(expr("stack(6, " +
        "'alpha', alpha_f, alpha_u, " +
        "'any', any_f, any_u, " +
        "'length', len_f, len_u, " +
        "'mean_word_len', mean_f, mean_u, " +
        "'repetition', rep_f, rep_u, " +
        "'stopword', stop_f, stop_u) AS (rule, n_fail, n_unique_fail)"),
        col("n_docs"))
      .select(col("rule"), col("n_fail"),
        expr("CASE WHEN n_docs = 0 THEN 0" +
          " ELSE n_fail * 1000000 div n_docs END").as("fail_ppm"),
        col("n_unique_fail"))
      .orderBy(col("rule"))
  }

  /** DuckDB oracle for [[ruleAttrition]] — the stopword literal is built
    * from the same Scala list the Column tree uses. */
  def ruleAttritionSql: String = {
    val stops = TextQueries.stopwords.values.flatten.toSeq.distinct
      .map(w => s"'$w'").mkString(", ")
    s"""WITH f AS (SELECT doc_id, text,
       |    [x for x in string_split_regex(lower(text), '[^a-z0-9]+')
       |      if len(x) > 0] AS t
       |  FROM documents),
       |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_toks,
       |    CASE WHEN length(text) = 0 THEN 0
       |      ELSE CAST(length(regexp_replace(lower(text), '[^a-z]', '',
       |        'g')) AS BIGINT) * 1000000 // length(text) END AS alpha_ppm
       |  FROM f),
       |tl AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT doc_id, unnest(t) AS tok FROM f) GROUP BY 1, 2),
       |ts AS (SELECT doc_id, SUM(c * len(tok)) AS tchars, MAX(c) AS topc,
       |    SUM(CASE WHEN list_contains([$stops], tok) THEN 1 ELSE 0 END)
       |      AS nstop
       |  FROM tl GROUP BY 1),
       |fl AS (SELECT base.doc_id,
       |    n_toks < 10 OR n_toks > 100000 AS f_len,
       |    CASE WHEN n_toks = 0 THEN false ELSE
       |      tchars * 1000000 // n_toks < 3000000 OR
       |      tchars * 1000000 // n_toks > 10000000 END AS f_mean,
       |    alpha_ppm < 500000 AS f_alpha,
       |    COALESCE(nstop, 0) < 2 AS f_stop,
       |    CASE WHEN n_toks = 0 THEN false ELSE
       |      topc * 1000000 // n_toks > 200000 END AS f_rep
       |  FROM base LEFT JOIN ts USING (doc_id)),
       |w AS (SELECT *,
       |    (CASE WHEN f_len THEN 1 ELSE 0 END +
       |     CASE WHEN f_mean THEN 1 ELSE 0 END +
       |     CASE WHEN f_alpha THEN 1 ELSE 0 END +
       |     CASE WHEN f_stop THEN 1 ELSE 0 END +
       |     CASE WHEN f_rep THEN 1 ELSE 0 END) AS nf FROM fl),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM w),
       |h AS (
       |  SELECT 'length' AS rule,
       |    CAST(SUM(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_fail,
       |    CAST(SUM(CASE WHEN f_len AND nf = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_unique_fail FROM w
       |  UNION ALL SELECT 'mean_word_len',
       |    CAST(SUM(CASE WHEN f_mean THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN f_mean AND nf = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM w
       |  UNION ALL SELECT 'alpha',
       |    CAST(SUM(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN f_alpha AND nf = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM w
       |  UNION ALL SELECT 'stopword',
       |    CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN f_stop AND nf = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM w
       |  UNION ALL SELECT 'repetition',
       |    CAST(SUM(CASE WHEN f_rep THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN f_rep AND nf = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM w
       |  UNION ALL SELECT 'any',
       |    CAST(SUM(CASE WHEN nf > 0 THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    FROM w)
       |SELECT rule, n_fail,
       |  CASE WHEN n_docs = 0 THEN 0
       |    ELSE n_fail * 1000000 // n_docs END AS fail_ppm,
       |  n_unique_fail
       |FROM h CROSS JOIN n ORDER BY rule""".stripMargin
  }

  /** q179: cross-SOURCE duplication matrix — for every unordered source
    * pair, the count of exact content fingerprints (q25's normalized-
    * token md5) present in BOTH, plus per-source distinct-fingerprint
    * counts and the pair's fingerprint-set Jaccard in ppm. The
    * provenance governance report: doc-level dedup (q15) says HOW MUCH
    * is duplicated, this says WHERE FROM — which crawl sources mirror
    * each other, which pair's overlap justifies dropping one feed.
    * Pairs with zero overlap are kept (the all-clear is part of the
    * report).
    *
    * Scale: ONE distinct (source, fp) shuffle (16-byte hashes, never
    * text); the self-join blocks on fp, whose fan-out per fingerprint is
    * bounded by the (tiny) source count squared; the pair spine is a
    * broadcast cross of the source-count table with itself. */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame =
    sourceOverlapDf(Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism))

  /** [[sourceOverlap]]'s core over any (source, text) frame — the unit
    * the spec drives with a planted cross-source duplicate (the test
    * corpus duplicates within sources only, so the shared-fp leg needs a
    * fixture to be non-vacuous). */
  def sourceOverlapDf(docs: DataFrame): DataFrame = {
    val sfp = docs
      .select(col("source"),
        md5(array_join(Text.tokens(col("text")), " ")).as("fp"))
      .distinct()
      .transform(PinExplain.pin) // feeds the counts AND both join sides
    val counts = sfp.groupBy(col("source")).agg(count(lit(1)).as("n_fp"))
    val shared = sfp.as("a")
      .join(sfp.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    counts.as("ca")
      .crossJoin(broadcast(counts.as("cb")))
      .filter(col("ca.source") < col("cb.source"))
      .select(col("ca.source").as("src_a"), col("cb.source").as("src_b"),
        col("ca.n_fp").as("n_fp_a"), col("cb.n_fp").as("n_fp_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("jaccard_ppm",
        expr("CASE WHEN n_fp_a + n_fp_b - n_shared = 0 THEN 0" +
          " ELSE n_shared * 1000000 div (n_fp_a + n_fp_b - n_shared) END"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** DuckDB oracle for [[sourceOverlap]]. The COALESCE matters:
    * DuckDB's array_to_string on an empty list is NULL where Spark's
    * array_join is '' (SURVEY §2.21 gotcha). */
  val sourceOverlapSql: String =
    """WITH fp AS (SELECT DISTINCT source,
      |    md5(COALESCE(array_to_string([t for t in
      |      string_split_regex(lower(text), '[^a-z0-9]+') if len(t) > 0],
      |      ' '), '')) AS fp
      |  FROM documents),
      |c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fp
      |  GROUP BY 1),
      |sh AS (SELECT a.source AS src_a, b.source AS src_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_shared
      |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT ca.source AS src_a, cb.source AS src_b,
      |  ca.n_fp AS n_fp_a, cb.n_fp AS n_fp_b,
      |  COALESCE(sh.n_shared, 0) AS n_shared,
      |  CASE WHEN ca.n_fp + cb.n_fp - COALESCE(sh.n_shared, 0) = 0 THEN 0
      |    ELSE COALESCE(sh.n_shared, 0) * 1000000
      |      // (ca.n_fp + cb.n_fp - COALESCE(sh.n_shared, 0)) END
      |    AS jaccard_ppm
      |FROM c ca JOIN c cb ON ca.source < cb.source
      |LEFT JOIN sh ON sh.src_a = ca.source AND sh.src_b = cb.source
      |ORDER BY 1, 2""".stripMargin

  /** q182: DSIR — Data Selection via Importance Resampling (Xie et al.
    * NeurIPS 2023), the hashed-n-gram importance-weighting selector: a
    * TARGET domain (here `targetSrc`, the paper's "Wikipedia" role) and
    * the raw pool (every other source) each induce a distribution over
    * `buckets` hashed-bigram feature buckets; each pool document scores
    * the sum over its bigram OCCURRENCES of the per-bucket log-likelihood
    * ratio λ(b) = ln(p̂_t(b) / p̂_r(b)) under add-one smoothing, and the
    * selection is the top pool-size/`selDiv` docs by that weight. The
    * report is the q177-shaped composition table: what importance
    * weighting does to per-(lang, source) balance — DSIR is the
    * distribution-MATCHING counterpoint to q177's pure-quality cut and
    * q171's temperature rule.
    *
    * Portability discipline: λ(b) is one double division inside one ln,
    * `round(·, 9)`, cast DECIMAL(28,9) (the q168 protocol — identical
    * expression both engines, rounded far above libm's 1-ulp zone), and
    * per-doc weights are EXACT decimal sums, so the (weight DESC, doc_id)
    * selection order is engine-portable with no float ties.
    *
    * Scale: ONE corpus tokenization feeds a persisted (doc_id, is_t, b)
    * bigram-bucket frame reused by both passes; bucket counts are a
    * ≤2·`buckets`-row broadcast table; the rank over the pool is
    * [[Ranks.globalRowNumber]] (range partition + offsets — no
    * single-reducer window). Corpus text never shuffles: only 8-byte
    * bucket ids and decimal partials move. */
  def dsirSelect(s: SparkSession, dir: String, targetSrc: String = "src0",
                 buckets: Int = 4096, selDiv: Long = 5L): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val bg = docs
      .select(col("doc_id"), (col("source") === targetSrc).as("is_t"),
        Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("is_t"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => PortableHash.h60(concat(a, lit(" "), b)) % buckets))
        .as("b"))
      .persist()
    val cnt = bg.groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
    val tot = cnt.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val lam = cnt.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log((col("ct") + 1).cast("double") *
            (col("nr") + buckets).cast("double") /
          ((col("cr") + 1).cast("double") *
            (col("nt") + buckets).cast("double"))), 9)
          .cast("decimal(28,9)").as("lam"))
    val w = bg.filter(!col("is_t"))
      .join(broadcast(lam), "b")
      .groupBy(col("doc_id")).agg(sum(col("lam")).as("w"))
    val pool = docs.filter(col("source") =!= targetSrc)
      .select(col("doc_id"), col("lang"), col("source"))
      .join(w, Seq("doc_id"), "left")
      .withColumn("w", coalesce(col("w"),
        lit(BigDecimal(0)).cast("decimal(38,9)")))
      // UnaryMinus preserves DECIMAL(38,9); `lit(0) - w` would promote to
      // precision 39 and round the 9th decimal away (the q190 trap) —
      // near-boundary weights differing at 1e-9 would then tie here but
      // not in the DuckDB oracle, flipping the selected set.
      .withColumn("ord", (-col("w")).as("ord"))
    val budget = pool.agg(expr(s"count(1) div $selDiv").as("budget"))
    val ranked = Ranks.globalRowNumber(pool, Nil, Seq("ord", "doc_id"))
      .crossJoin(broadcast(budget))
    val out = ranked.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_pool"),
        sum(when(col("rnk") <= col("budget"), 1L).otherwise(0L)).as("n_sel"),
        sum(col("w")).as("sw"),
        sum(when(col("rnk") <= col("budget"), col("w"))
          .otherwise(lit(BigDecimal(0)).cast("decimal(38,9)"))).as("sws"))
      .select(col("lang"), col("source"), col("n_pool"), col("n_sel"),
        expr("n_sel * 1000000 div n_pool").as("sel_ppm"),
        round(col("sw").cast("double") / col("n_pool").cast("double"), 6)
          .as("mean_w"),
        when(col("n_sel") === 0, lit(0.0))
          .otherwise(round(col("sws").cast("double") /
            col("n_sel").cast("double"), 6)).as("mean_w_sel"))
      .orderBy(col("lang"), col("source"))
    Dedup.pinAndRelease(out, bg)
  }

  /** DuckDB oracle for [[dsirSelect]]. */
  def dsirSelectSql(targetSrc: String = "src0", buckets: Int = 4096,
                    selDiv: Long = 5L): String = {
    val h = PortableHash.h60Sql("w1 || ' ' || w2")
    s"""WITH tk AS (SELECT doc_id, source = '$targetSrc' AS is_t,
       |    [t for t in string_split_regex(lower(text), '[^a-z0-9]+')
       |      if len(t) > 0] AS t
       |  FROM documents),
       |bgr AS (SELECT doc_id, is_t, unnest(t[1:len(t)-1]) AS w1,
       |    unnest(t[2:len(t)]) AS w2 FROM tk WHERE len(t) >= 2),
       |bb AS (SELECT doc_id, is_t, ($h) % $buckets AS b FROM bgr),
       |cnt AS (SELECT b,
       |    CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
       |  FROM bb GROUP BY 1),
       |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
       |    CAST(SUM(cr) AS BIGINT) AS nr FROM cnt),
       |lam AS (SELECT b, CAST(round(ln(
       |      CAST(ct + 1 AS DOUBLE) * CAST(nr + $buckets AS DOUBLE) /
       |      (CAST(cr + 1 AS DOUBLE) * CAST(nt + $buckets AS DOUBLE))), 9)
       |    AS DECIMAL(28,9)) AS lam
       |  FROM cnt CROSS JOIN tot),
       |wd AS (SELECT doc_id, SUM(lam) AS w FROM bb JOIN lam USING (b)
       |  WHERE NOT is_t GROUP BY 1),
       |pool AS (SELECT d.doc_id, d.lang, d.source,
       |    COALESCE(wd.w, CAST(0 AS DECIMAL(38,9))) AS w
       |  FROM documents d LEFT JOIN wd USING (doc_id)
       |  WHERE d.source <> '$targetSrc'),
       |b2 AS (SELECT CAST(COUNT(*) // $selDiv AS BIGINT) AS budget
       |  FROM pool),
       |r AS (SELECT *, row_number() OVER (ORDER BY w DESC, doc_id) AS rnk
       |  FROM pool)
       |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_pool,
       |  CAST(SUM(CASE WHEN rnk <= budget THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_sel,
       |  CAST(SUM(CASE WHEN rnk <= budget THEN 1 ELSE 0 END) AS BIGINT)
       |    * 1000000 // COUNT(*) AS sel_ppm,
       |  round(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) AS mean_w,
       |  CASE WHEN SUM(CASE WHEN rnk <= budget THEN 1 ELSE 0 END) = 0
       |    THEN 0.0
       |    ELSE round(CAST(SUM(CASE WHEN rnk <= budget THEN w
       |        ELSE CAST(0 AS DECIMAL(38,9)) END) AS DOUBLE) /
       |      SUM(CASE WHEN rnk <= budget THEN 1 ELSE 0 END), 6) END
       |    AS mean_w_sel
       |FROM r CROSS JOIN b2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** q184: multinomial Naive Bayes source classifier + confusion matrix
    * — the fastText-role domain/quality classifier every curation
    * pipeline trains (CCNet's LM has q183; the CLASSIFIER leg is this),
    * kept to the one model whose training IS aggregation so a 100 TB fit
    * is a count pass, not SGD: add-one multinomial NB over tokens,
    * classes = `source`, fit on the q47 train split (h60(text)%100 < 80),
    * scored on the test split (≥ 90). Per test doc the class score is
    * ln p(c) + Σ_t ln p(t|c) with p(t|c) = (c_tc+1)/(n_c+V); the report
    * is the (actual, predicted) confusion matrix with row-share ppm —
    * the diagonal says whether sources are even SEPARABLE in token
    * space, which is what decides if a learned domain tagger (q58's
    * input) can work.
    *
    * Determinism: per-term `round(ln(·), 9)` summed in DECIMAL(28,9)
    * (q168 protocol), prior terms the same, argmax by (score DESC,
    * class ASC) via one min-struct aggregate — no float ties, no window.
    *
    * Scale: training is ONE (token, class) count aggregation; scoring
    * expands test tokens by the class spine (|classes|-row broadcast,
    * constant fan-out) and left-joins the (token, class) count table —
    * the single corpus-scale shuffle, hash-partitioned on the token key.
    * Unseen tokens cost ln((n_c+V)/1) through the same expression. */
  def nbConfusion(s: SparkSession, dir: String): DataFrame =
    nbConfusionOf(Tables.load(s, dir, "documents"))

  /** Core of [[nbConfusion]] over any (doc_id, source, text) frame:
    * split by the q47 hash, fit the count model, score. */
  def nbConfusionOf(docsIn: DataFrame): DataFrame = {
    val bucket = PortableHash.h60(col("text")) % 100
    val docs = docsIn
      .select(col("doc_id"), col("source"), Text.tokens(col("text")).as("toks"),
        bucket.as("bk"))
      .filter(col("bk") < 80 || col("bk") >= 90)
      .select(col("doc_id"), col("source"), col("toks"),
        (col("bk") < 80).as("is_train"))
      .persist()
    val trainToks = docs.filter(col("is_train"))
      .select(col("source").as("cls"), explode(col("toks")).as("t"))
    val tc = trainToks.groupBy(col("t"), col("cls"))
      .agg(count(lit(1)).as("c_tc"))
    val cd = docs.filter(col("is_train"))
      .groupBy(col("source").as("cls")).agg(count(lit(1)).as("n_docs_c"))
    val out = nbScoreFrom(tc, cd,
      docs.filter(!col("is_train")).select(col("doc_id"), col("source"),
        col("toks")))
    Dedup.pinAndRelease(out, docs)
  }

  /** NB scoring as a pure function of the count-table MODEL — the entry
    * point the [[graft.streaming]] NbModelStream twin shares with batch
    * q184. `tc` = (t, cls, c_tc) token-class counts, `cd` = (cls,
    * n_docs_c) training doc counts; everything else (context masses,
    * vocabulary size, priors) derives from those two frames, so an
    * incrementally-maintained model scores identically to a batch fit. */
  /** The full (doc, class, score) NB posterior-score grid — shared by the
    * q184 confusion matrix (argmax only) and the q190 margin-calibration
    * audit (argmax AND runner-up). Scores are DECIMAL(38,9) sums of
    * round-9 ln terms (q168 protocol): exact multiples of 10⁻⁹ in both
    * engines, so downstream margins are integer nano-nats. */
  private def nbGrid(tc: DataFrame, cd: DataFrame,
                     testDocs: DataFrame): DataFrame = {
    val nTrain = cd.agg(sum(col("n_docs_c")).as("n_train"))
    val nc = tc.groupBy(col("cls")).agg(sum(col("c_tc")).as("n_c"))
    val vocab = tc.select(col("t")).distinct()
      .agg(count(lit(1)).as("v"))
    val spine = cd.join(broadcast(nc), "cls")
      .crossJoin(broadcast(nTrain)).crossJoin(broadcast(vocab))
      .select(col("cls"), col("n_c"), col("v"),
        round(log(col("n_docs_c").cast("double") /
          col("n_train").cast("double")), 9)
          .cast("decimal(28,9)").as("prior"))
    val testTok = testDocs
      .select(col("doc_id"), col("source"), explode(col("toks")).as("t"))
    val terms = testTok.crossJoin(broadcast(spine))
      .join(tc.select(col("t").as("tk"), col("cls").as("cls2"), col("c_tc")),
        col("t") === col("tk") && col("cls") === col("cls2"), "left")
      .select(col("doc_id"), col("source"), col("cls"),
        round(log((coalesce(col("c_tc"), lit(0L)) + 1).cast("double") /
          (col("n_c") + col("v")).cast("double")), 9)
          .cast("decimal(28,9)").as("term"))
      .groupBy(col("doc_id"), col("source"), col("cls"))
      .agg(sum(col("term")).as("tsum"))
    // empty-token test docs score prior-only: rebuild the full
    // (doc, class) grid from the doc spine so they are still classified
    testDocs
      .select(col("doc_id"), col("source"))
      .crossJoin(broadcast(spine.select(col("cls"), col("prior"))))
      .join(terms, Seq("doc_id", "source", "cls"), "left")
      .select(col("doc_id"), col("source"), col("cls"),
        (col("prior") + coalesce(col("tsum"),
          lit(BigDecimal(0)).cast("decimal(38,9)"))).as("score"))
  }

  def nbScoreFrom(tc: DataFrame, cd: DataFrame, testDocs: DataFrame)
      : DataFrame = {
    val grid = nbGrid(tc, cd, testDocs)
    val pred = grid
      .groupBy(col("doc_id"), col("source"))
      // unary minus keeps DECIMAL(38,9) (subtraction from lit(0) would
      // reduce to scale 8, letting near-tied class scores tie in Spark
      // but not in the full-scale DuckDB oracle)
      .agg(min(struct((-col("score")).as("neg"), col("cls"))).as("best"))
      .select(col("doc_id"), col("source").as("actual"),
        col("best.cls").as("predicted"))
    pred.groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_total",
        sum(col("n_docs")).over(Window.partitionBy(col("actual"))))
      .select(col("actual"), col("predicted"), col("n_docs"),
        expr("n_docs * 1000000 div row_total").as("share_ppm"))
      .orderBy(col("actual"), col("predicted"))
  }

  /** q194: decontamination-method agreement — do the exact-13-gram rule
    * (q56) and the winnow-fingerprint rule (q170) flag the SAME
    * documents? Per split (train/val): the 2×2 flag contingency (both /
    * gram-only / winnow-only / neither over all probed docs) and Cohen's
    * κ in integer ppm (the q166 convention, same guards). The number a
    * curation team reads before running both scrubs at 100 TB: κ→1
    * means winnow is redundant with exact grams on this corpus, low κ
    * with a populated winnow-only cell is q170's robustness-to-rewording
    * claim made measurable. (The semantic leg q173 keys its split on
    * vec_id, not the text hash, so it is deliberately NOT in this
    * matrix — its flag set lives in a different id space.)
    *
    * Scale: both flag legs are the operators' own broadcast-probe
    * shapes; the matrix is a 2-row aggregate over (doc_id, 2 bits). */
  def decontamAgreement(s: SparkSession, dir: String): DataFrame = {
    val probed = bucketedText(s, dir).filter(col("bucket") < 90)
      .select(col("doc_id"),
        when(col("bucket") < 80, "train").otherwise("val").as("split"))
    val gramF = decontaminate(s, dir, ordered = false)
      .select(col("doc_id"), lit(1L).as("ga"))
    val winnF = winnowDecontaminate(s, dir, ordered = false)
      .select(col("doc_id"), lit(1L).as("wa"))
    val flags = probed
      .join(gramF, Seq("doc_id"), "left")
      .join(winnF, Seq("doc_id"), "left")
      .select(col("split"), (coalesce(col("ga"), lit(0L)) === 1L).as("a"),
        (coalesce(col("wa"), lit(0L)) === 1L).as("b"))
    flags.groupBy(col("split")).agg(
        count(lit(1)).as("n_docs"),
        sum((col("a") && col("b")).cast("long")).as("n11"),
        sum((col("a") && !col("b")).cast("long")).as("n10"),
        sum((!col("a") && col("b")).cast("long")).as("n01"),
        sum((!col("a") && !col("b")).cast("long")).as("n00"))
      .select(col("split"), col("n_docs"), col("n11"), col("n10"),
        col("n01"), col("n00"),
        expr("CASE WHEN n_docs = 0 THEN 0 " +
          "WHEN n_docs * n_docs = (n11 + n10) * (n11 + n01) " +
          "+ (n01 + n00) * (n10 + n00) THEN " +
          "  CASE WHEN n11 + n00 = n_docs THEN 1000000 ELSE 0 END " +
          "ELSE (n_docs * (n11 + n00) - ((n11 + n10) * (n11 + n01) " +
          "+ (n01 + n00) * (n10 + n00))) * 1000000 div " +
          "(n_docs * n_docs - ((n11 + n10) * (n11 + n01) " +
          "+ (n01 + n00) * (n10 + n00))) END").as("kappa_ppm"))
      .orderBy(col("split"))
  }

  /** DuckDB oracle for [[decontamAgreement]] — the q56 and q170 oracle
    * chains sharing one tokenization, flag sets joined onto the probed
    * population, κ per the q166 integer convention. */
  val decontamAgreementSql: String = {
    val h = PortableHash.h60Sql("text")
    val g13 = PortableHash.h60Sql("shingle")
    val wg = PortableHash.h60Sql("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")
    s"""WITH toks AS (SELECT doc_id,
       |    [t for t in string_split_regex(lower(text), '[^a-z0-9]+')
       |      if len(t) > 0] AS t
       |  FROM documents),
       |b AS (SELECT doc_id, ($h) % 100 AS bucket FROM documents),
       |gsh AS (SELECT DISTINCT doc_id, $g13 AS gh FROM (
       |  SELECT doc_id,
       |    unnest([list_aggregate(t[i:i+12], 'string_agg', ' ')
       |      for i in generate_series(1, len(t) - 12)]) AS shingle
       |  FROM toks WHERE len(t) >= 13)),
       |gb AS (SELECT gsh.doc_id, b.bucket, gsh.gh FROM gsh
       |  JOIN b USING (doc_id)),
       |tg AS (SELECT DISTINCT gh FROM gb WHERE bucket >= 90),
       |gramf AS (SELECT DISTINCT doc_id FROM gb
       |  WHERE bucket < 90 AND gh IN (SELECT gh FROM tg)),
       |g AS (SELECT doc_id, unnest(generate_series(1, len(t) - 2)) AS pos,
       |    unnest([$wg
       |      for i in generate_series(1, len(t) - 2)]) AS h
       |  FROM toks WHERE len(t) >= 3),
       |m AS (SELECT doc_id, pos,
       |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS n
       |  FROM g),
       |fp AS (SELECT DISTINCT doc_id, mh AS fp FROM m WHERE pos + 3 <= n),
       |f2 AS (SELECT fp.doc_id, fp.fp, b.bucket FROM fp
       |  JOIN b ON b.doc_id = fp.doc_id),
       |tst AS (SELECT DISTINCT fp FROM f2 WHERE bucket >= 90),
       |winf AS (SELECT doc_id FROM f2 WHERE bucket < 90 GROUP BY doc_id
       |  HAVING SUM(CASE WHEN fp IN (SELECT fp FROM tst) THEN 1 ELSE 0 END)
       |    >= 2),
       |pr AS (SELECT b.doc_id,
       |    CASE WHEN bucket < 80 THEN 'train' ELSE 'val' END AS split,
       |    (b.doc_id IN (SELECT doc_id FROM gramf)) AS a,
       |    (b.doc_id IN (SELECT doc_id FROM winf)) AS bb
       |  FROM b WHERE bucket < 90),
       |c AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN a AND bb THEN 1 ELSE 0 END) AS BIGINT) AS n11,
       |    CAST(SUM(CASE WHEN a AND NOT bb THEN 1 ELSE 0 END) AS BIGINT) AS n10,
       |    CAST(SUM(CASE WHEN NOT a AND bb THEN 1 ELSE 0 END) AS BIGINT) AS n01,
       |    CAST(SUM(CASE WHEN NOT a AND NOT bb THEN 1 ELSE 0 END) AS BIGINT) AS n00
       |  FROM pr GROUP BY 1)
       |SELECT split, n_docs, n11, n10, n01, n00,
       |  CASE WHEN n_docs = 0 THEN 0
       |    WHEN n_docs * n_docs = (n11 + n10) * (n11 + n01)
       |      + (n01 + n00) * (n10 + n00) THEN
       |      CASE WHEN n11 + n00 = n_docs THEN 1000000 ELSE 0 END
       |    ELSE (n_docs * (n11 + n00) - ((n11 + n10) * (n11 + n01)
       |    + (n01 + n00) * (n10 + n00))) * 1000000 //
       |    (n_docs * n_docs - ((n11 + n10) * (n11 + n01)
       |    + (n01 + n00) * (n10 + n00))) END AS kappa_ppm
       |FROM c ORDER BY split""".stripMargin
  }

  /** q190: NB margin-calibration audit — is the classifier's CONFIDENCE
    * meaningful, not just its argmax? The q184 model's per-doc decision
    * margin (top-1 minus top-2 class log-score, integer nano-nats — the
    * exact-arithmetic stand-in for posterior confidence) ranks the test
    * split into global deciles; the report per decile is docs, accuracy,
    * and mean margin. A monotone accuracy curve is what licenses
    * fastText-style confidence-thresholded filtering (keep only docs the
    * domain tagger is sure about — the q58 mix's input); a flat curve
    * says the margin carries no signal and thresholding is arbitrary.
    *
    * Determinism: scores are DECIMAL(38,9) sums of round-9 ln terms, so
    * margins are exact multiples of 10⁻⁹ recovered as BIGINT nano-nats;
    * top-2 selection is an array_sort over the (−score, cls) total order
    * (|classes| entries per doc — bounded, no window); deciles ride
    * [[Ranks.globalRowNumber]]'s range-partitioned rank.
    *
    * Scale: identical to q184 until the grid (one (token, class)
    * count aggregation + one token-keyed scoring shuffle); after it,
    * everything is test-split-sized. */
  def nbMarginCalib(s: SparkSession, dir: String): DataFrame =
    nbMarginCalibOf(Tables.load(s, dir, "documents"))

  /** Core of [[nbMarginCalib]] over any (doc_id, source, text) frame.
    *
    * The score grid here is NOT [[nbGrid]]: q184's DECIMAL(38,9)
    * prior+sum addition silently loses its 9th decimal in Spark
    * (precision-39 promotion reduces to scale 8 under allowPrecisionLoss)
    * while DuckDB keeps scale 9 — invisible to an argmax, fatal to a
    * nano-nat margin. This audit therefore scores in BIGINT nano-nats
    * end-to-end (the q188 protocol): every ln term rounds to an integer
    * once, and all downstream arithmetic is exact in both engines. */
  def nbMarginCalibOf(docsIn: DataFrame): DataFrame = {
    val bucket = PortableHash.h60(col("text")) % 100
    val docs = docsIn
      .select(col("doc_id"), col("source"),
        Text.tokens(col("text")).as("toks"), bucket.as("bk"))
      .filter(col("bk") < 80 || col("bk") >= 90)
      .select(col("doc_id"), col("source"), col("toks"),
        (col("bk") < 80).as("is_train"))
      .persist()
    val trainToks = docs.filter(col("is_train"))
      .select(col("source").as("cls"), explode(col("toks")).as("t"))
    val tc = trainToks.groupBy(col("t"), col("cls"))
      .agg(count(lit(1)).as("c_tc"))
    val cd = docs.filter(col("is_train"))
      .groupBy(col("source").as("cls")).agg(count(lit(1)).as("n_docs_c"))
    val testDocs = docs.filter(!col("is_train"))
      .select(col("doc_id"), col("source"), col("toks"))
    val nTrain = cd.agg(sum(col("n_docs_c")).as("n_train"))
    val nc = tc.groupBy(col("cls")).agg(sum(col("c_tc")).as("n_c"))
    val vocab = tc.select(col("t")).distinct().agg(count(lit(1)).as("v"))
    val spine = cd.join(broadcast(nc), "cls")
      .crossJoin(broadcast(nTrain)).crossJoin(broadcast(vocab))
      .select(col("cls"), col("n_c"), col("v"),
        round(log(col("n_docs_c").cast("double") /
          col("n_train").cast("double")) * 1e9).cast("long").as("prior_nn"))
    val terms = testDocs
      .select(col("doc_id"), col("source"), explode(col("toks")).as("t"))
      .crossJoin(broadcast(spine))
      .join(tc.select(col("t").as("tk"), col("cls").as("cls2"), col("c_tc")),
        col("t") === col("tk") && col("cls") === col("cls2"), "left")
      .select(col("doc_id"), col("source"), col("cls"),
        round(log((coalesce(col("c_tc"), lit(0L)) + 1).cast("double") /
          (col("n_c") + col("v")).cast("double")) * 1e9)
          .cast("long").as("t_nn"))
      .groupBy(col("doc_id"), col("source"), col("cls"))
      .agg(sum(col("t_nn")).as("tsum_nn"))
    val grid = testDocs
      .select(col("doc_id"), col("source"))
      .crossJoin(broadcast(spine.select(col("cls"), col("prior_nn"))))
      .join(terms, Seq("doc_id", "source", "cls"), "left")
      .select(col("doc_id"), col("source"), col("cls"),
        (col("prior_nn") + coalesce(col("tsum_nn"), lit(0L)))
          .as("score_nn"))
    val perDoc = grid.groupBy(col("doc_id"), col("source"))
      .agg(array_sort(collect_list(struct(
        (-col("score_nn")).as("neg"), col("cls")))).as("a"))
      .select(col("doc_id"),
        when(get(col("a"), lit(0)).getField("cls") === col("source"), 1L)
          .otherwise(0L).as("ok"),
        // margin = s₁ − s₂ = neg₂ − neg₁, exact long arithmetic
        coalesce(get(col("a"), lit(1)).getField("neg") -
          get(col("a"), lit(0)).getField("neg"), lit(0L)).as("margin_nn"))
      .persist()
    val ranked =
      Ranks.globalRowNumber(perDoc, Seq.empty, Seq("margin_nn", "doc_id"))
    val nAll = perDoc.agg(count(lit(1)).as("n_all"))
    val out = ranked.crossJoin(broadcast(nAll))
      .select(col("ok"), col("margin_nn"),
        expr("(rnk - 1) * 10 div n_all + 1").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ok")).as("n_correct"),
        sum(col("margin_nn")).as("sm"))
      .select(col("decile"), col("n_docs"), col("n_correct"),
        expr("n_correct * 1000000 div n_docs").as("acc_ppm"),
        expr("sm div n_docs").as("mean_margin_nn"))
      .orderBy(col("decile"))
    Dedup.pinAndRelease(out, docs, perDoc)
  }

  /** DuckDB oracle for [[nbMarginCalib]] — the integer nano-nat grid
    * (NOT the q184 decimal CTEs; see [[nbMarginCalibOf]]) plus top-2
    * margin, rank-decile bucketing, and the per-decile report. */
  val nbMarginCalibSql: String = {
    val h = PortableHash.h60Sql("text")
    s"""WITH d AS (SELECT doc_id, source, ($h) % 100 AS bk,
       |    [t for t in string_split_regex(lower(text), '[^a-z0-9]+')
       |      if len(t) > 0] AS t
       |  FROM documents WHERE ($h) % 100 < 80 OR ($h) % 100 >= 90),
       |trn AS (SELECT source AS cls, unnest(t) AS tok FROM d
       |  WHERE bk < 80),
       |tc AS (SELECT tok, cls, CAST(COUNT(*) AS BIGINT) AS c_tc FROM trn
       |  GROUP BY 1, 2),
       |cl AS (SELECT source AS cls, CAST(COUNT(*) AS BIGINT) AS n_docs_c
       |  FROM d WHERE bk < 80 GROUP BY 1),
       |ntr AS (SELECT CAST(SUM(n_docs_c) AS BIGINT) AS n_train FROM cl),
       |nc AS (SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_c FROM trn
       |  GROUP BY 1),
       |vb AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM trn),
       |sp AS (SELECT cl.cls, nc.n_c, vb.v,
       |    CAST(round(ln(CAST(cl.n_docs_c AS DOUBLE) /
       |      CAST(ntr.n_train AS DOUBLE)) * 1000000000) AS BIGINT)
       |      AS prior_nn
       |  FROM cl JOIN nc USING (cls) CROSS JOIN ntr CROSS JOIN vb),
       |tt AS (SELECT doc_id, source, unnest(t) AS tok FROM d
       |  WHERE bk >= 90),
       |tm AS (SELECT tt.doc_id, tt.source, sp.cls,
       |    SUM(CAST(round(ln(CAST(COALESCE(tc.c_tc, 0) + 1 AS DOUBLE) /
       |      CAST(sp.n_c + sp.v AS DOUBLE)) * 1000000000) AS BIGINT))
       |      AS tsum_nn
       |  FROM tt CROSS JOIN sp
       |  LEFT JOIN tc ON tc.tok = tt.tok AND tc.cls = sp.cls
       |  GROUP BY 1, 2, 3),
       |gr AS (SELECT td.doc_id, td.source, sp.cls,
       |    sp.prior_nn + COALESCE(tm.tsum_nn, 0) AS score_nn
       |  FROM (SELECT DISTINCT doc_id, source FROM d WHERE bk >= 90) td
       |  CROSS JOIN sp
       |  LEFT JOIN tm ON tm.doc_id = td.doc_id AND tm.cls = sp.cls),
       |sc2 AS (SELECT doc_id, source, cls, score_nn,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score_nn DESC, cls) AS rn FROM gr),
       |pd AS (SELECT a.doc_id,
       |    CASE WHEN a.cls = a.source THEN 1 ELSE 0 END AS ok,
       |    a.score_nn - b.score_nn AS margin_nn
       |  FROM sc2 a JOIN sc2 b ON b.doc_id = a.doc_id AND b.rn = 2
       |  WHERE a.rn = 1),
       |rk AS (SELECT ok, margin_nn,
       |    row_number() OVER (ORDER BY margin_nn, doc_id) AS rnk,
       |    COUNT(*) OVER () AS n_all FROM pd)
       |SELECT (rnk - 1) * 10 // n_all + 1 AS decile,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(ok) AS BIGINT) AS n_correct,
       |  CAST(SUM(ok) * 1000000 // COUNT(*) AS BIGINT) AS acc_ppm,
       |  CAST(SUM(margin_nn) // COUNT(*) AS BIGINT) AS mean_margin_nn
       |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The shared q184/q190 oracle CTE chain, through the (doc, class,
    * score) grid `gr` — mirrors [[nbGrid]]. */
  private def nbGridCtes: String = {
    val h = PortableHash.h60Sql("text")
    s"""WITH d AS (SELECT doc_id, source, ($h) % 100 AS bk,
       |    [t for t in string_split_regex(lower(text), '[^a-z0-9]+')
       |      if len(t) > 0] AS t
       |  FROM documents WHERE ($h) % 100 < 80 OR ($h) % 100 >= 90),
       |trn AS (SELECT source AS cls, unnest(t) AS tok FROM d
       |  WHERE bk < 80),
       |tc AS (SELECT tok, cls, CAST(COUNT(*) AS BIGINT) AS c_tc FROM trn
       |  GROUP BY 1, 2),
       |cl AS (SELECT source AS cls, CAST(COUNT(*) AS BIGINT) AS n_docs_c
       |  FROM d WHERE bk < 80 GROUP BY 1),
       |ntr AS (SELECT CAST(SUM(n_docs_c) AS BIGINT) AS n_train FROM cl),
       |nc AS (SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_c FROM trn
       |  GROUP BY 1),
       |vb AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM trn),
       |sp AS (SELECT cl.cls, nc.n_c, vb.v,
       |    CAST(round(ln(CAST(cl.n_docs_c AS DOUBLE) /
       |      CAST(ntr.n_train AS DOUBLE)), 9) AS DECIMAL(28,9)) AS prior
       |  FROM cl JOIN nc USING (cls) CROSS JOIN ntr CROSS JOIN vb),
       |tt AS (SELECT doc_id, source, unnest(t) AS tok FROM d
       |  WHERE bk >= 90),
       |tm AS (SELECT tt.doc_id, tt.source, sp.cls,
       |    SUM(CAST(round(ln(CAST(COALESCE(tc.c_tc, 0) + 1 AS DOUBLE) /
       |      CAST(sp.n_c + sp.v AS DOUBLE)), 9) AS DECIMAL(28,9)))
       |      AS tsum
       |  FROM tt CROSS JOIN sp
       |  LEFT JOIN tc ON tc.tok = tt.tok AND tc.cls = sp.cls
       |  GROUP BY 1, 2, 3),
       |gr AS (SELECT td.doc_id, td.source, sp.cls,
       |    sp.prior + COALESCE(tm.tsum, CAST(0 AS DECIMAL(38,9)))
       |      AS score
       |  FROM (SELECT DISTINCT doc_id, source FROM d WHERE bk >= 90) td
       |  CROSS JOIN sp
       |  LEFT JOIN tm ON tm.doc_id = td.doc_id AND tm.cls = sp.cls)""".stripMargin
  }

  /** DuckDB oracle for [[nbConfusion]]. */
  val nbConfusionSql: String =
    s"""$nbGridCtes,
       |pr AS (SELECT doc_id, source AS actual, cls AS predicted
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, cls) AS rn FROM gr)
       |  WHERE rn = 1),
       |cm AS (SELECT actual, predicted, CAST(COUNT(*) AS BIGINT)
       |    AS n_docs FROM pr GROUP BY 1, 2)
       |SELECT actual, predicted, n_docs,
       |  CAST(n_docs * 1000000 //
       |    SUM(n_docs) OVER (PARTITION BY actual) AS BIGINT)
       |    AS share_ppm
       |FROM cm ORDER BY 1, 2""".stripMargin

}

