package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** q131 prefix-filtered exact set-similarity join: losslessness (the pruned
  * join reproduces the exhaustive answer) and the candidate-space reduction
  * that is the operator's reason to exist at scale. */
class PpjoinSpec extends SparkSpec {

  private def shingleRows = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    .select(col("doc_id"), explode(Text.shingles(col("toks"), 3)).as("shingle"))
    .distinct()

  test("ppjoin equals the exhaustive inverted-index join at t=0.5") {
    val pp = Dedup.ppjoinPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exhaustive = Dedup.ngramJaccardPairs(spark, sf, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pp == exhaustive)
    assert(pp.nonEmpty, "fixture corpus has near-dup pairs at t=0.5")
  }

  test("prefix filtering shrinks the candidate space vs the full index") {
    val sh = shingleRows.persist()
    try {
      val full = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
      val prefix = sh.join(dfreq, "shingle")
        .withColumn("rk", row_number().over(w))
        .join(cnt, "doc_id")
        .filter(col("rk") <= col("n") - expr("(n + 1) div 2") + 1)
        .select(col("doc_id"), col("shingle"), col("n"))
      val pruned = prefix.as("a").join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * 2 >= col("a.n") && col("a.n") * 2 >= col("b.n"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      assert(pruned < full,
        s"prefix join should prune candidates: $pruned vs $full")
      // the shipped pipeline adds the asymmetric index prefix and the
      // positional filter on top — its candidate set must be a further
      // strict cut, while still covering every verified pair
      val ranked = sh.join(dfreq, "shingle")
        .withColumn("rk", row_number().over(w))
        .join(cnt, "doc_id")
      val probe = ranked
        .filter(col("rk") <= col("n") - expr("(n + 1) div 2") + 1)
        .select(col("doc_id"), col("shingle"), col("n"), col("rk"))
      val index = ranked
        .filter(col("rk") <= col("n") - expr("(2 * n + 2) div 3") + 1)
        .select(col("doc_id"), col("shingle"), col("n"), col("rk"))
      val positional = probe.as("a").join(index.as("b"),
          col("a.shingle") === col("b.shingle") &&
          (col("b.n") < col("a.n") ||
            (col("b.n") === col("a.n") &&
              col("b.doc_id") < col("a.doc_id"))) &&
          col("b.n") * 2 >= col("a.n") &&
          least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")) + 1 >=
            expr("(a.n + b.n + 2) div 3"))
        .select(least(col("a.doc_id"), col("b.doc_id")),
          greatest(col("a.doc_id"), col("b.doc_id"))).distinct().count()
      assert(positional < pruned,
        s"positional+index-prefix should cut further: $positional vs $pruned")
      // every verified pair is still among the candidates (recall)
      val nPairs = Dedup.ppjoinPairs(spark, sf).count()
      assert(positional >= nPairs)
      info(s"candidates: full=$full prefix-only=$pruned " +
        s"positional=$positional verified pairs=$nPairs")
    } finally { sh.unpersist(); () }
  }
}
