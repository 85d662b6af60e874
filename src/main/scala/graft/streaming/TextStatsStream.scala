package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.Dedup

/** Streaming twins for the round-8 corpus-diversity/governance queries —
  * the established twin discipline (IndexStream, CurationStreaming,
  * IncrementalDedupStreaming): each operator maintains mergeable state
  * per micro-batch with O(batch) new work, survives at-least-once
  * re-delivery via a seen-doc anti-join, and its report is bit-equal to
  * the batch query at every trigger boundary (spec-pinned across uneven
  * splits). At 100 TB the state frames bucket by their key and persist
  * through [[VersionedState.applyBatch]] like every other twin. */
object TextStatsStream {

  private[streaming] def emptySeen(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))

  private[streaming] def newDocs(seen: DataFrame, batch: DataFrame): DataFrame =
    batch.join(seen, Seq("doc_id"), "left_anti").localCheckpoint(true)
}

/** Incremental q158 (`TextQueries.distinctN`): lexical diversity
  * (distinct-n ppm for n = 1..4) maintained as per-(n, gram) occurrence
  * counts. Partials MERGE BY SUM — each doc's grams are a pure function
  * of the doc, so any batch split folds to the same counts — and the
  * report re-derives (total, n_distinct) from the count table: total =
  * Σcount, n_distinct = row count per n. State is gram-vocabulary-sized
  * per order; at scale it buckets by (n, gram). */
object DistinctNStream {
  import TextStatsStream._

  /** Fold one micro-batch of (doc_id, text). Returns (state', seen'). */
  def mergeBatch(state: DataFrame, seen: DataFrame,
                 batch: DataFrame): (DataFrame, DataFrame) = {
    val fresh = newDocs(seen, batch)
    val delta = (1 to 4).map { n =>
      fresh.select(Text.tokens(col("text")).as("toks"))
        .select(explode(Text.shinglesPositional(col("toks"), n)).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c_new"))
        .select(lit(n.toLong).as("n"), col("g"), col("c_new"))
    }.reduce(_ unionByName _)
    val state2 = state.join(delta, Seq("n", "g"), "full_outer")
      .select(col("n"), col("g"),
        (coalesce(col("c"), lit(0L)) + coalesce(col("c_new"), lit(0L)))
          .as("c"))
      .localCheckpoint(true)
    val seen2 = seen.unionByName(fresh.select(col("doc_id")))
      .localCheckpoint(true)
    (state2, seen2)
  }

  /** The q158 report off maintained state — identical columns/order. */
  def report(s: SparkSession, state: DataFrame): DataFrame = {
    import s.implicits._
    val spine = (1L to 4L).toDF("n")
    spine.join(
        state.groupBy(col("n")).agg(sum(col("c")).as("total"),
          count(lit(1)).as("n_distinct")),
        Seq("n"), "left")
      .select(col("n"), coalesce(col("total"), lit(0L)).as("total"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
      .select(col("n"), col("total"), col("n_distinct"),
        expr("n_distinct * 1000000 div total").as("distinct_ppm"))
      .orderBy(col("n"))
  }

  def emptyState(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.LongType))))
}

/** Incremental q151 (`TextQueries.gramNovelty`): per-document novelty
  * emitted ON ARRIVAL, against an append-only first-seen gram set (the
  * IndexStream pattern: the state row (g, fd) never changes once
  * written, because first-seen is first-seen).
  *
  * Contract: ingest ordered by doc_id with batch boundaries between ids
  * (the AttributionStream ordered-ingest discipline) — q151 defines
  * novelty by first occurrence in doc_id order, so a doc's score is
  * final the moment every smaller id has arrived. Within that contract
  * streamed rows equal batch q151 row-for-row (state merges with `least`
  * so even a same-batch tie resolves to the true minimum). */
object NoveltyStream {
  import TextStatsStream._

  /** Fold one micro-batch of (doc_id, text). Returns
    * (state', seen', this batch's final (doc_id, n_grams, n_novel,
    * novelty_ppm) rows). */
  def mergeBatch(state: DataFrame, seen: DataFrame,
                 batch: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val fresh = newDocs(seen, batch)
    val sh = fresh
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Text.shingles(col("toks"))).as("g"))
      .localCheckpoint(true)
    val batchFirst = sh.groupBy(col("g")).agg(min(col("doc_id")).as("bfd"))
    val state2 = state.join(batchFirst, Seq("g"), "full_outer")
      .select(col("g"),
        least(coalesce(col("fd"), col("bfd")),
          coalesce(col("bfd"), col("fd"))).as("fd"))
      .localCheckpoint(true)
    val per = sh.join(state2, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum((col("fd") === col("doc_id")).cast("long")).as("n_novel"))
    val out = fresh.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_grams") > 0,
          expr("n_novel * 1000000 div n_grams")).as("novelty_ppm"))
    val seen2 = seen.unionByName(fresh.select(col("doc_id")))
      .localCheckpoint(true)
    (state2, seen2, out)
  }

  def emptyState(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("fd",
          org.apache.spark.sql.types.LongType))))
}

/** Incremental q152 (`TextQueries.effectiveSize`): the dedup-weighted
  * effective-size report maintained against INCREMENTAL near-dup
  * clustering — the heaviest twin, because cluster membership is global
  * state that new arrivals can MERGE (a new doc near-duplicating two
  * old clusters unites them).
  *
  * Three state frames, all keyed and bucketable:
  *  - `hashes` (doc_id, shingle-hash): the persisted fingerprint
  *    artifact (incrementalDedup's discipline) — feeds exact Jaccard
  *    verification of candidates;
  *  - `bands` (doc_id, band_id, band_hash): the persisted LSH index —
  *    new docs' band rows probe it, so candidates are new×all, never
  *    old×old re-discovered;
  *  - `labels` (doc_id, n_tokens, lbl): cluster assignment, lbl = the
  *    component-minimum doc id.
  *
  * Per trigger: O(batch) shingling, a bucket-join of the batch's band
  * rows against the index, exact verification of only those candidates,
  * then a LABEL-LEVEL star contraction (metadata-sized: nodes are the
  * touched cluster labels) to fold any merges. Arrival order is
  * irrelevant — the discovered edge set is exactly the batch
  * [[Dedup.minhashLshPairs]] edge set at every point (each qualifying
  * pair shares a band bucket and is found when its later doc arrives),
  * so streamed clusters == batch clusters == the q152 report, which the
  * spec pins across uneven splits and a re-delivered batch. */
object EffectiveSizeStream {
  import TextStatsStream._

  /** Fold one micro-batch of (doc_id, text).
    * Returns (hashes', bands', labels'). */
  def mergeBatch(hashes: DataFrame, bands: DataFrame, labels: DataFrame,
                 batch: DataFrame, threshold: Double = 0.3,
                 k: Int = 64, nBands: Int = 16)
      : (DataFrame, DataFrame, DataFrame) = {
    val fresh = newDocs(labels.select(col("doc_id")), batch)
    val freshToks = fresh.select(col("doc_id"),
      Text.tokens(col("text")).as("toks"))
    val newHashes = Dedup.shingleHashes(freshToks).localCheckpoint(true)
    val newBands = Dedup.lshBandRows(newHashes, k, nBands)
      .localCheckpoint(true)
    val hashes2 = hashes.unionByName(newHashes).localCheckpoint(true)
    val bands2 = bands.unionByName(newBands).localCheckpoint(true)
    // candidates: batch band rows probe the FULL index (old + new) —
    // a pair is discovered exactly once, when its later doc arrives
    val cand = newBands.as("a").join(bands2.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"))
      .distinct()
    // exact verification against the fingerprint artifact (the
    // minhashLshPairs protocol verbatim: occurrence counts, not sets)
    val cnt = hashes2.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val shared = cand
      .join(hashes2.select(col("doc_id").as("id_a"), col("h")), "id_a")
      .join(hashes2.select(col("doc_id").as("id_b"), col("h")),
        Seq("id_b", "h"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
    val edges = shared
      .join(cnt.select(col("doc_id").as("id_a"), col("nsh").as("na")), "id_a")
      .join(cnt.select(col("doc_id").as("id_b"), col("nsh").as("nb")), "id_b")
      .filter(col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")).cast("double") >= threshold)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    // label-level merge: map new edges through current labels (new docs
    // label themselves), contract the touched labels, relabel members
    val newLabels = labels
      .unionByName(fresh
        .select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
          col("doc_id").as("lbl")))
      .localCheckpoint(true)
    val lblOf = newLabels.select(col("doc_id"), col("lbl"))
    val lblEdges = edges
      .join(lblOf.select(col("doc_id").as("id_a"), col("lbl").as("p1")), "id_a")
      .join(lblOf.select(col("doc_id").as("id_b"), col("lbl").as("p2")), "id_b")
      .filter(col("p1") =!= col("p2"))
      .select(col("p1"), col("p2")).distinct()
    val labels2 = if (lblEdges.isEmpty) newLabels else {
      val merged = graft.operators.Graph.componentsStarFrom(lblEdges)
        .select(col("pk").as("lbl"), col("component"))
      newLabels.join(merged, Seq("lbl"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("component"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
    }
    (hashes2, bands2, labels2)
  }

  /** The q152 report off maintained labels — identical columns/order. */
  def report(labels: DataFrame): DataFrame = {
    val perCluster = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("csize"), sum(col("n_tokens")).as("c_tokens"))
      .select(col("csize"), col("c_tokens"),
        expr("c_tokens * 1000000 div csize").as("eff_micro"))
    perCluster.groupBy(col("csize"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("c_tokens")).as("raw_tokens"),
        sum(col("eff_micro")).as("effective_micro"))
      .orderBy(col("csize"))
  }

  def emptyHashes(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("h",
          org.apache.spark.sql.types.LongType))))

  def emptyBands(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("band_id",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("band_hash",
          org.apache.spark.sql.types.LongType))))

  def emptyLabels(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lbl",
          org.apache.spark.sql.types.LongType))))
}

/** Incremental q141 (`TextQueries.boilerplateStrip`): the C4 repeated-
  * span removal with its MINING state maintained incrementally. State is
  * the per-shingle doc-frequency table (each doc contributes its
  * DISTINCT 3-grams once — a pure function of the doc, so any batch
  * split folds by sum to the same counts, and the seen-doc anti-join
  * makes at-least-once re-delivery a no-op). The mined top-k set is a
  * deterministic (df DESC, shingle) head of that state at any trigger,
  * and the report — the strip of the delivered corpus under the CURRENT
  * set — is bit-equal to the batch q141 on the same docs. At 100 TB the
  * df table buckets by shingle and persists through
  * [[VersionedState.applyBatch]]; the strip pass itself is the batch
  * operator's scan-speed HOF (`boilerplateStripWith`), re-runnable on
  * any slice of the corpus with the frozen artifact. */
object BoilerplateStripStream {
  import TextStatsStream._

  def emptyState(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shingle",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("df",
          org.apache.spark.sql.types.LongType))))

  /** Fold one micro-batch of (doc_id, text). Returns (state', seen'). */
  def mergeBatch(state: DataFrame, seen: DataFrame,
                 batch: DataFrame): (DataFrame, DataFrame) = {
    val fresh = newDocs(seen, batch)
    val delta = fresh.select(Text.tokens(col("text")).as("toks"))
      .select(explode(Text.shingles(col("toks"))).as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df_new"))
    val state2 = state.join(delta, Seq("shingle"), "full_outer")
      .select(col("shingle"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("df_new"), lit(0L)))
          .as("df"))
      .localCheckpoint(true)
    val seen2 = seen.unionByName(fresh.select(col("doc_id")))
      .localCheckpoint(true)
    (state2, seen2)
  }

  /** The deterministic mined artifact off maintained state — identical
    * selection rule to the batch mine (df >= minDf, (df DESC, shingle)
    * top-k). */
  def minedSet(state: DataFrame, minDf: Long = 5,
               topK: Int = 100): Array[String] =
    state.filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("shingle")).limit(topK)
      .select(col("shingle")).collect().map(_.getString(0))

  /** q141 report: strip `docs` under the current mined state — equals
    * the batch query on the delivered corpus at every trigger. */
  def report(docs: DataFrame, state: DataFrame, minDf: Long = 5,
             topK: Int = 100): DataFrame =
    graft.operators.TextQueries.boilerplateStripWith(
      docs, minedSet(state, minDf, topK))
}

/** Incremental q172/q174 (`TextQueries.dupSpans`/`spanStrip`): the
  * duplicated-SPAN family with its gram-df MINING state maintained
  * incrementally — the same fold discipline as [[BoilerplateStripStream]]
  * at the positional-8-gram grain. Each doc contributes its DISTINCT
  * 8-grams once (pure function of the doc → any split folds by sum; the
  * seen anti-join makes re-delivery a no-op); the flagged set at any
  * trigger is `df >= minDf` over the state, and both reports — the span
  * structure AND the strip-long-keep-short rebuild — reuse the batch
  * operators' own stages (`dupSpansFrom`/`spanStripFrom`), so streamed
  * == batch is structural given equal state. At 100 TB the df table
  * buckets by gram and persists through [[VersionedState.applyBatch]]. */
object DupSpanStream {
  import TextStatsStream._
  import graft.operators.TextQueries

  val L = 8

  def emptyState(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("df",
          org.apache.spark.sql.types.LongType))))

  /** Fold one micro-batch of (doc_id, text). Returns (state', seen'). */
  def mergeBatch(state: DataFrame, seen: DataFrame,
                 batch: DataFrame): (DataFrame, DataFrame) = {
    val fresh = newDocs(seen, batch)
    val delta = fresh
      .select(explode(array_distinct(
        Text.shinglesPositional(Text.tokens(col("text")), L))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df_new"))
    val state2 = state.join(delta, Seq("g"), "full_outer")
      .select(col("g"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("df_new"), lit(0L)))
          .as("df"))
      .localCheckpoint(true)
    val seen2 = seen.unionByName(fresh.select(col("doc_id")))
      .localCheckpoint(true)
    (state2, seen2)
  }

  private def flagged(state: DataFrame, minDf: Long): DataFrame =
    state.filter(col("df") >= minDf).select(col("g"))

  /** q172 report off maintained state — identical columns/order. */
  def spansReport(docs: DataFrame, state: DataFrame,
                  minDf: Long = 2L): DataFrame =
    TextQueries.dupSpansFrom(TextQueries.spanDocs(docs),
      flagged(state, minDf), L)

  /** q174 report off maintained state — identical columns/order. */
  def stripReport(docs: DataFrame, state: DataFrame, minDf: Long = 2L,
                  minSpan: Long = 10L): DataFrame =
    TextQueries.spanStripFrom(TextQueries.spanDocs(docs),
      flagged(state, minDf), L, minSpan)
}

/** Incremental q178 (`TextQueries.chunkDedup`): the chunk inventory as
  * TWO mergeable state tables — per-(source, fingerprint) chunk counts
  * (clen rides along: a fingerprint determines its chunk text, hence its
  * length) and per-source doc counts. A doc's chunk rows are a pure
  * function of the doc ([[TextQueries.chunkRows]]), so partials merge by
  * sum under any batch split, and re-delivery is absorbed by the seen
  * anti-join. The report re-derives the batch aggregate from state
  * (n_chunks = Σc, uniq = state rows, chunk_toks = Σ c·clen) and feeds
  * the SAME [[TextQueries.chunkReport]] assembly — streamed == batch is
  * structural given equal state. At 100 TB the fp state buckets by
  * (source, fp) exactly like the incremental-dedup signature store. */
object ChunkDedupStream {
  import TextStatsStream._
  import graft.operators.TextQueries

  def emptyState(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("clen",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.LongType))))

  def emptyDocState(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_docs",
          org.apache.spark.sql.types.LongType))))

  /** Fold one micro-batch of (doc_id, source, text).
    * Returns (state', docState', seen'). */
  def mergeBatch(state: DataFrame, docState: DataFrame, seen: DataFrame,
                 batch: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val fresh = newDocs(seen, batch)
    val delta = TextQueries.chunkRows(fresh)
      .groupBy(col("source"), col("fp"), col("clen"))
      .agg(count(lit(1)).as("c_new"))
    val state2 = state.join(delta, Seq("source", "fp", "clen"), "full_outer")
      .select(col("source"), col("fp"), col("clen"),
        (coalesce(col("c"), lit(0L)) + coalesce(col("c_new"), lit(0L)))
          .as("c"))
      .localCheckpoint(true)
    val docDelta = fresh.groupBy(col("source"))
      .agg(count(lit(1)).as("d_new"))
    val docState2 = docState.join(docDelta, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("d_new"), lit(0L)))
          .as("n_docs"))
      .localCheckpoint(true)
    val seen2 = seen.unionByName(fresh.select(col("doc_id")))
      .localCheckpoint(true)
    (state2, docState2, seen2)
  }

  /** The q178 report off maintained state — identical columns/order. */
  def report(state: DataFrame, docState: DataFrame): DataFrame =
    TextQueries.chunkReport(docState,
      state.groupBy(col("source"))
        .agg(sum(col("c")).as("n_chunks"),
          count(lit(1)).as("uniq_chunks"),
          sum(col("c") * col("clen")).as("chunk_toks")))
}

/** Incremental q184 (`Curation.nbConfusion`): the Naive Bayes MODEL as
  * streaming state — the classifier-refresh pattern a production
  * curation stack runs (the model store grows with each labeled batch;
  * scoring is a pure function of the store). State is exactly the two
  * count tables batch q184 fits: `tc` (t, cls, c_tc) token-class
  * occurrence counts and `cd` (cls, n_docs_c) doc counts — both merge
  * BY SUM (a doc's token counts are a pure function of the doc), so any
  * ingest order or batch split folds to the same model, and context
  * masses / vocabulary size / priors all DERIVE from them inside
  * [[graft.operators.Curation.nbScoreFrom]]. Re-delivery is absorbed by
  * the seen-doc anti-join; at 100 TB `tc` buckets by token like the
  * postings/bigram stores.
  *
  * The twin ingests TRAIN-split docs only (the q47 bucket predicate is
  * applied inside mergeBatch, so a mixed feed is safe); score() over the
  * test split equals batch q184 row-for-row once the same train docs
  * have arrived — structural, given equal state, and spec-pinned across
  * uneven splits and a re-delivered batch. */
object NbModelStream {
  import TextStatsStream._
  import graft.functions.PortableHash
  import graft.operators.Curation

  def emptyTc(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cls",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_tc",
          org.apache.spark.sql.types.LongType))))

  def emptyCd(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cls",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_docs_c",
          org.apache.spark.sql.types.LongType))))

  /** Fold one micro-batch of (doc_id, source, text); only q47-train
    * docs (h60(text)%100 < 80) update the model.
    * Returns (tc', cd', seen'). */
  def mergeBatch(tc: DataFrame, cd: DataFrame, seen: DataFrame,
                 batch: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val fresh = newDocs(seen, batch)
    val train = fresh
      .filter(PortableHash.h60(col("text")) % 100 < 80)
      .select(col("doc_id"), col("source").as("cls"),
        Text.tokens(col("text")).as("toks"))
      .localCheckpoint(true)
    val tcDelta = train
      .select(col("cls"), explode(col("toks")).as("t"))
      .groupBy(col("t"), col("cls")).agg(count(lit(1)).as("c_new"))
    val tc2 = tc.join(tcDelta, Seq("t", "cls"), "full_outer")
      .select(col("t"), col("cls"),
        (coalesce(col("c_tc"), lit(0L)) + coalesce(col("c_new"), lit(0L)))
          .as("c_tc"))
      .localCheckpoint(true)
    val cdDelta = train.groupBy(col("cls")).agg(count(lit(1)).as("d_new"))
    val cd2 = cd.join(cdDelta, Seq("cls"), "full_outer")
      .select(col("cls"),
        (coalesce(col("n_docs_c"), lit(0L)) + coalesce(col("d_new"), lit(0L)))
          .as("n_docs_c"))
      .localCheckpoint(true)
    val seen2 = seen.unionByName(fresh.select(col("doc_id")))
      .localCheckpoint(true)
    (tc2, cd2, seen2)
  }

  /** Score a (doc_id, source, text) test frame against the maintained
    * model — the batch q184 confusion report, from streamed state. */
  def score(tc: DataFrame, cd: DataFrame, testDocs: DataFrame): DataFrame =
    Curation.nbScoreFrom(tc, cd,
      testDocs.select(col("doc_id"), col("source"),
        Text.tokens(col("text")).as("toks")))
}

/** Incremental q188 (`TextQueries.pplBuckets`): the CCNet-style bigram
  * LM as streaming state — the perplexity-filter-refresh pattern (the
  * model store grows with each crawled train batch; bucketing any corpus
  * snapshot is a pure function of the store). State is exactly what the
  * batch fit aggregates: `bc` (w1, w2, c_ab) bigram counts and `tv`
  * (t, c_t) train token counts (V = row count; counts kept so the store
  * merges BY SUM — any ingest order or batch split folds to the same
  * model), plus the seen-doc set for re-delivery absorption. Context
  * masses derive from `bc` inside
  * [[graft.operators.TextQueries.pplBucketsFrom]], so scoring from
  * streamed state equals the batch q188 report row-for-row once the
  * same train docs have arrived — spec-pinned across uneven splits and
  * a re-delivered batch. At 100 TB `bc` buckets by bigram key like the
  * postings/NB stores. */
object PplModelStream {
  import TextStatsStream._
  import graft.functions.PortableHash
  import graft.operators.TextQueries

  def emptyBc(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w1",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("w2",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_ab",
          org.apache.spark.sql.types.LongType))))

  def emptyTv(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_t",
          org.apache.spark.sql.types.LongType))))

  /** Fold one micro-batch of (doc_id, source, text); only q47-train docs
    * (h60(text)%100 < 80) update the model. Returns (bc', tv', seen'). */
  def mergeBatch(bc: DataFrame, tv: DataFrame, seen: DataFrame,
                 batch: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val fresh = newDocs(seen, batch)
    val train = fresh
      .filter(PortableHash.h60(col("text")) % 100 < 80)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .localCheckpoint(true)
    val bcDelta = train.filter(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_new"))
    val bc2 = bc.join(bcDelta, Seq("w1", "w2"), "full_outer")
      .select(col("w1"), col("w2"),
        (coalesce(col("c_ab"), lit(0L)) + coalesce(col("c_new"), lit(0L)))
          .as("c_ab"))
      .localCheckpoint(true)
    // vocabulary counts over ALL train docs' tokens (the batch q188
    // vocab has no >=2-token filter)
    val tvDelta = train.select(explode(col("toks")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c_new"))
    val tv2 = tv.join(tvDelta, Seq("t"), "full_outer")
      .select(col("t"),
        (coalesce(col("c_t"), lit(0L)) + coalesce(col("c_new"), lit(0L)))
          .as("c_t"))
      .localCheckpoint(true)
    val seen2 = seen.unionByName(fresh.select(col("doc_id")))
      .localCheckpoint(true)
    (bc2, tv2, seen2)
  }

  /** Bucket a (doc_id, source, text) corpus snapshot against the
    * maintained model — the batch q188 report, from streamed state. */
  def score(bc: DataFrame, tv: DataFrame, docs: DataFrame): DataFrame = {
    val scoredBg = docs
      .select(col("doc_id"), col("source"),
        Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("doc_id"), col("source"),
        col("g.w1").as("w1"), col("g.w2").as("w2"))
    TextQueries.pplBucketsFrom(bc.select(col("w1"), col("w2"), col("c_ab")),
      tv.agg(count(lit(1)).as("v")), scoredBg)
  }
}

/** Incremental q187 (`Layout.packContamination`): the packed-window
  * contamination table as streaming state — the layout family's twin.
  * Packing is ARRIVAL-ORDER by construction in a stream (a packer
  * appends each batch's documents at the current global token offset),
  * so state is: the (win, m, t, sl2) window table (merged BY SUM — a
  * window split across batches accumulates its segments exactly, since
  * each doc contributes its segment rows once), the scalar next-offset,
  * and the seen-doc set for re-delivery absorption. When batches arrive
  * in doc_id order the packing coincides with batch q187's and
  * `report()` equals it row-for-row (spec-pinned, incl. a re-delivered
  * batch and a window straddling a batch boundary); out-of-order
  * delivery is still a VALID packing — just a different one, as for any
  * real packer. At 100 TB the window table buckets by window id and
  * only the current tail window is ever touched by more than one
  * batch's delta. */
object PackContamStream {
  import TextStatsStream._
  import graft.operators.{Layout, Ranks}

  def emptyWins(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("win",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("m",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sl2",
          org.apache.spark.sql.types.LongType))))

  /** Fold one micro-batch of (doc_id, source, text) at the current
    * token offset. Returns (wins', nextOff', seen'). */
  def mergeBatch(wins: DataFrame, nextOff: Long, seen: DataFrame,
                 batch: DataFrame,
                 ctxLen: Long = 2048L): (DataFrame, Long, DataFrame) = {
    val fresh = newDocs(seen, batch)
    val docs = fresh
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .localCheckpoint(true)
    val segs = Ranks.globalRunningSum(docs, Seq.empty, Seq("doc_id"),
      "n_tokens")
      .select(col("n_tokens"),
        (col("cum") - col("n_tokens") + lit(nextOff)).as("off"))
      .select(explode(sequence(expr(s"off div $ctxLen"),
        expr(s"(off + n_tokens - 1) div $ctxLen"))).as("win"),
        col("off"), col("n_tokens"))
      .select(col("win"),
        (least(col("off") + col("n_tokens"), (col("win") + 1) * ctxLen) -
          greatest(col("off"), col("win") * ctxLen)).as("l"))
    val delta = segs.groupBy(col("win"))
      .agg(count(lit(1)).as("m_new"), sum(col("l")).as("t_new"),
        sum(col("l") * col("l")).as("sl2_new"))
    val wins2 = wins.join(delta, Seq("win"), "full_outer")
      .select(col("win"),
        (coalesce(col("m"), lit(0L)) + coalesce(col("m_new"), lit(0L)))
          .as("m"),
        (coalesce(col("t"), lit(0L)) + coalesce(col("t_new"), lit(0L)))
          .as("t"),
        (coalesce(col("sl2"), lit(0L)) + coalesce(col("sl2_new"), lit(0L)))
          .as("sl2"))
      .localCheckpoint(true)
    val total = docs.agg(coalesce(sum(col("n_tokens")), lit(0L)))
      .head().getLong(0)
    val seen2 = seen.unionByName(fresh.select(col("doc_id")))
      .localCheckpoint(true)
    (wins2, nextOff + total, seen2)
  }

  /** The q187 report off maintained state — identical columns/order. */
  def report(wins: DataFrame): DataFrame = Layout.contamReport(wins)
}
