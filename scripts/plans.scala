import java.io.PrintWriter
val names = Seq("q01_pricing_summary","q05_star_wide","q17_minhash_pairs","q20_ann_topk","q27_embed_dups","q30_sessionize","q39_product_stats_full","q40_order_wide_enriched","q41_visitor_stats_full","q42_ann_lsh_banded","q43_winnow","q44_pii_scan","q45_repetition","q46_bm25_terms","q48_dup_clusters")
val sb = new StringBuilder
sb.append("# PLANS - physical plan review (generated; sf0.01)\n\nEvidence for the scale checklist: pushdown reaches the scans,\ndims broadcast, aggregation is partial/final, codegen spans are wide.\nRegenerate: spark-shell -I scripts/plans.scala after operator changes.\n\nThe only nested-loop joins below are q20_ann_topk's broadcast cross of\nthe 5-query set against the corpus (the declared brute-force ground\ntruth) and q46_bm25_terms's broadcast of a SINGLE corpus-stats row.\nEvery scale-path query (q17 minhash, q27 banded embedding dedup, q42\nbanded ANN, q43 winnowing) generates candidates/minima via shuffled or\nbroadcast hash operations.\n")
names.foreach { n => val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01"); df.collect(); val p = df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("simple")); sb.append(s"\n## $n\n\n```\n$p```\n") }
new PrintWriter("/root/repo/PLANS.md") { write(sb.toString); close() }
println("PLANS_WRITTEN")
