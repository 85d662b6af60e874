package graft.operators

import graft.SparkSpec

/** Scale-readiness assertions on the physical plans: these encode the
  * "would this survive 100×" checks — broadcast joins where a dimension is
  * small, filter pushdown reaching the parquet scan, whole-stage codegen
  * presence. If a refactor regresses a plan shape, these fail before any
  * benchmark does.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("star join broadcasts the true dimensions (no shuffle for dims)") {
    val plan = planOf(RefQueries.starWide(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
  }

  test("pricing summary pushes the shipdate filter into the parquet scan") {
    val plan = RefQueries.pricingSummary(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
  }

  test("pricing summary reads only needed columns (column pruning)") {
    val df = RefQueries.pricingSummary(spark, sf)
    val plan = planOf(df)
    // l_orderkey/l_partkey/l_suppkey are not referenced: must be pruned
    assert(!plan.contains("l_orderkey"), "scan reads unneeded columns")
    df.collect() // materialize so AQE finalizes the plan with codegen stages
    val finalPlan = planOf(df)
    assert(finalPlan.contains("*("), s"agg should be codegen'd:\n$finalPlan")
  }

  test("keyword explode avoids shuffling raw text (projects tokens first)") {
    val plan = planOf(RefQueries.keywordCount(spark, sf))
    // the exchange after explode carries only the token column + partial count
    assert(plan.contains("HashAggregate"), "expected partial aggregation")
  }

  test("corpus/sketch queries prune to exactly the columns they touch") {
    // q53's layout needs only (doc_id, text); reading more at 100 TB
    // multiplies the scan cost by the untouched columns' width
    val packPlan = planOf(Corpus.packAssign(spark, sf))
    assert(packPlan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"q53 scan not pruned to (doc_id, text):\n$packPlan")
    val chunkPlan = planOf(Corpus.chunkSpans(spark, sf))
    assert(chunkPlan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"q54 scan not pruned to (doc_id, text):\n$chunkPlan")
    // q51's sketch needs only (user_id, ts) from events
    val kmvPlan = planOf(RefQueries.uvPerDayApprox(spark, sf))
    // ts is timestamp_ntz in the current testdata generation, bigint (nanos)
    // in the earlier one — the pruning property holds either way
    assert(Seq("ts:bigint", "ts:timestamp_ntz").exists(t =>
        kmvPlan.contains(s"ReadSchema: struct<user_id:bigint,$t>") ||
        kmvPlan.contains(s"ReadSchema: struct<$t,user_id:bigint>")),
      s"q51 scan not pruned to (user_id, ts):\n$kmvPlan")
    // q60's quantile sketch needs only (lang, n_chars)
    val lqPlan = planOf(Curation.lenQuantiles(spark, sf))
    assert(lqPlan.contains("ReadSchema: struct<lang:string,n_chars:bigint>"),
      s"q60 scan not pruned to (lang, n_chars):\n$lqPlan")
    // q61's as-of never reads props (the widest events column)
    val aoPlan = planOf(AsOf.asOfClick(spark, sf))
    assert(!aoPlan.contains("props"),
      s"q61 scan reads the untouched props column:\n$aoPlan")
  }

  test("q64 retrieval broadcasts the query terms and group-limits the top-k") {
    val plan = planOf(TextQueries.bm25Retrieval(spark, sf))
    // the corpus-side score frame must never shuffle to meet the
    // metadata-sized query table
    assert(plan.contains("BroadcastHashJoin"),
      s"query-terms join not broadcast:\n$plan")
    // row_number + rk<=k filter should plan the map-side group-limit prune
    assert(plan.contains("WindowGroupLimit"),
      s"top-k not group-limited:\n$plan")
  }

  test("q69 correlated subqueries decorrelate into aggregate joins") {
    val plan = planOf(RefQueries.premiumParts(spark, sf))
    // a surviving per-row scalar subquery re-executes the inner aggregate
    // once per outer row — the scale-killer Catalyst's decorrelation
    // rewrite exists to prevent
    assert(!plan.contains("ScalarSubquery"),
      s"correlated subquery not decorrelated:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected aggregate join:\n$plan")
  }

  test("q70 binned range join plans an equi hash join, not a nested loop") {
    val plan = planOf(RangeJoin.windowEventStats(spark, sf))
    // the whole point of binning: the containment predicate alone would
    // plan BroadcastNestedLoopJoin (per-event scan of every window)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$plan")
    assert(plan.contains("HashJoin"), s"expected a hash equi-join:\n$plan")
  }

  test("q72 point-in-time enrichment plans the union-sort as-of, not a range join") {
    val plan = planOf(Scd.pointInTimeEnrich(spark, sf))
    // the naive formulation (purchases ⋈ history on user AND a time-range
    // predicate, then max-per-key) would plan a nested loop or an
    // exploding range join; the union-sort construction is one hash
    // exchange per side feeding a single running window
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"as-of fell back to a non-equi join:\n$plan")
    assert(plan.contains("Union") && plan.contains("last("),
      s"expected union-sort carry-forward window:\n$plan")
    // both change-stream filters reach the parquet scan
    assert(plan.contains("event_type") && plan.contains("DataFilters"),
      s"change-stream filter not pushed:\n$plan")
  }

  test("q74 session stats plan partial-aggregates before the key shuffle") {
    val plan = planOf(RefQueries.sessionVisitorStats(spark, sf))
    // native session machinery: per-partition partial session aggregation,
    // ONE user_id exchange, then state merge — no per-event key shuffle of
    // raw rows without combining
    assert(plan.contains("MergingSessions"), s"expected session merge:\n$plan")
    assert(plan.contains("partial_count"), s"expected partial aggregation:\n$plan")
  }

  test("q85 rollup expands the 6-row partials, not the scan") {
    val plan = planOf(RefQueries.rollupPricing(spark, sf))
    val lines = plan.linesIterator.toArray
    val expandIdx = lines.indexWhere(_.contains("Expand"))
    assert(expandIdx >= 0, s"no Expand in rollup plan:\n$plan")
    // the Expand's input must be post-shuffle reduced data, not the scan
    val below = lines.slice(expandIdx + 1, expandIdx + 4).mkString("\n")
    assert(below.contains("Exchange") || below.contains("ShuffleQueryStage")
        || below.contains("AQEShuffleRead") || below.contains("HashAggregate"),
      s"Expand feeds from the raw scan:\n$plan")
  }

  test("q95 cube expands the reduced partials, not the scan") {
    val plan = planOf(RefQueries.cubeOrders(spark, sf))
    val lines = plan.linesIterator.toArray
    val expandIdx = lines.indexWhere(_.contains("Expand"))
    assert(expandIdx >= 0, s"no Expand in cube plan:\n$plan")
    val below = lines.slice(expandIdx + 1, expandIdx + 4).mkString("\n")
    assert(below.contains("Exchange") || below.contains("ShuffleQueryStage")
        || below.contains("AQEShuffleRead") || below.contains("HashAggregate"),
      s"Expand feeds from the raw scan:\n$plan")
  }

  test("q76 profiling plans per-column aggregates with no multi-distinct expand") {
    val plan = planOf(RefQueries.profileLineitem(spark, sf))
    assert(!plan.contains("Expand"), s"multi-distinct Expand back:\n$plan")
    // each union branch scans exactly one column
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint>"),
      s"single-column pruning lost:\n$plan")
  }

  test("q90 snapshot diff plans a keyed full-outer join, never a nested loop") {
    val plan = planOf(graft.operators.Curation.corpusDiff(spark, sf))
    assert(plan.contains("FullOuter"), s"full outer join missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested loop in diff plan:\n$plan")
  }

  test("q91 boilerplate projects tokens before the generator and top-ks without a global sort") {
    val plan = planOf(TextQueries.boilerplateGrams(spark, sf))
    // the generator-inlining trap's signature: tokenization re-inlined at
    // every element_at site instead of reading the projected toks column
    assert(!plan.contains("element_at(filter(split"),
      s"tokenization inlined into the generator:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k not planned as TakeOrdered:\n$plan")
  }

  test("q89 decile window is partitioned by lang (ranking distributes)") {
    val plan = planOf(RefQueries.langDeciles(spark, sf))
    assert(plan.contains("windowspecdefinition(lang"),
      s"NTILE window lost its partitioning:\n$plan")
  }

  test("q98 broadcasts item supports; pair join is equi on the order key") {
    val plan = planOf(Graph.basketPairs(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"item-support joins should broadcast:\n$plan")
    // the pair self-join must key on ok (equi), never loop
    assert(!plan.contains("NestedLoop") || plan.contains("BroadcastNestedLoopJoin"),
      s"pair join degenerated:\n$plan")
  }

  test("q99 triangle joins are all hash equi-joins on vertex keys") {
    val plan = planOf(Graph.triangleCounts(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"triangle join looped:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected keyed joins:\n$plan")
  }

  test("q101 fuzzy blocking plans an equi join on the prefix key") {
    val plan = planOf(Dedup.fuzzyHeadPairs(spark, sf))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"blocking did not reach the join key:\n$plan")
  }

  test("q96 reduces the fact table before the day-spine window") {
    val df = graft.operators.Series.gapFill(spark, sf)
    val plan = planOf(df)
    // the unpartitioned spine window must sit ABOVE the day aggregate:
    // exactly one scan of orders, filters pushed
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderpriority)") ||
      plan.contains("PushedFilters: [IsNotNull(o_orderstatus)"),
      s"segment filters not pushed into scan:\n$plan")
    assert(plan.split("Scan parquet").length - 1 <= 2,
      s"orders scanned more than expected:\n$plan")
  }

  test("q141 strip pass is shuffle-free: the mined set ships in the plan") {
    val plan = planOf(TextQueries.boilerplateStrip(spark, sf))
    // the removal stage is per-row HOF work over an inlined literal set;
    // the ONLY exchange allowed is the declared output ordering
    assert(!plan.contains("Join"), s"strip pass joins:\n$plan")
    val exchanges = plan.split("Exchange").length - 1
    assert(exchanges <= 1, s"strip pass shuffles beyond the sort:\n$plan")
  }

  test("q142 Apriori prunes via broadcast semi-joins before counting") {
    val plan = planOf(Graph.frequentTriples(spark, sf))
    assert(plan.contains("LeftSemi"), s"L2 prune not a semi join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"pair/prune joins not broadcast:\n$plan")
    // the only nested loop allowed is the single-row n_orders cross join
    val bnlj = plan.split("BroadcastNestedLoopJoin").length - 1
    assert(bnlj <= 1, s"unexpected nested loops:\n$plan")
  }

  test("q154 co-occurrence emits pairs per row — no token self-join") {
    val plan = planOf(TextQueries.cooccurrence(spark, sf))
    assert(!plan.contains("Join"), s"co-occurrence joins:\n$plan")
    assert(plan.contains("HashAggregate"), "expected partial aggregation")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k not TakeOrdered:\n$plan")
  }

  test("q151 novelty reuses the gram exchange for the join-back") {
    val plan = planOf(TextQueries.gramNovelty(spark, sf))
    // first-seen min and the join-back shuffle on the same gram key: the
    // join must be a SortMergeJoin/ShuffledHashJoin on g, never a
    // nested loop, and the corpus text never reaches an exchange
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"novelty joins wrong:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(text"),
      s"raw text shuffled:\n$plan")
  }

  test("q162 HRW sharding: one aggregation exchange, rows never shuffled") {
    val plan = planOf(Layout.shardAssign(spark, sf))
    // the shard is a per-row expression over the scan; the only exchanges
    // allowed are the 16-group aggregate's partial->final hop (plus the
    // 1-row total broadcast) — a plan that repartitions documents by
    // doc_id or text would shuffle the corpus for nothing
    assert(!plan.contains("Exchange hashpartitioning(doc_id"),
      s"corpus shuffled by doc_id:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(text"),
      s"raw text shuffled:\n$plan")
    assert(plan.contains("HashAggregate"), s"agg not hash-based:\n$plan")
  }

  test("q164 coverage: raw text stays out of every exchange") {
    val plan = planOf(TextQueries.dupGramCoverage(spark, sf))
    assert(!plan.contains("Exchange hashpartitioning(text"),
      s"raw text shuffled:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"df join degenerated:\n$plan")
  }

  test("plan audit: no unplanned cartesian product in any declared query") {
    // CartesianProductExec = both sides large with no equi key and no
    // broadcast — a plan that cannot survive scale. Intentional small-side
    // cross joins plan as BroadcastNestedLoopJoin instead.
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val plan = planOf(fn(spark, sf))
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
    }
  }
}
