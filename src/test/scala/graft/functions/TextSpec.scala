package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  test("D1: CJK-aware tokenizer — latin runs + CJK bigrams (KeywordUtil parity)") {
    val s = spark
    import s.implicits._
    val df = Seq("Apple苹果手机iPhone 11", "小米", "pure latin text").toDF("text")
    val toks = df.select(Text.cjkTokens(col("text")).as("t")).collect()
      .map(_.getSeq[String](0))
    assert(toks(0).toSet === Set("apple", "iphone", "11", "苹果", "果手", "手机"))
    assert(toks(1) === Seq("小米"))
    assert(toks(2) === Seq("pure", "latin", "text"))
  }

  test("shingles: 3-gram over tokens, distinct, short docs empty") {
    val s = spark
    import s.implicits._
    val df = Seq("a b c d", "a b").toDF("text")
    val sh = df.select(Text.shingles(Text.tokens(col("text")), 3).as("s")).collect()
      .map(_.getSeq[String](0))
    assert(sh(0) === Seq("a b c", "b c d"))
    assert(sh(1) === Seq.empty)
  }

  test("minhash signatures: equal sets agree, disjoint sets differ") {
    val s = spark
    import s.implicits._
    val df = Seq(("x", "a b c d e f"), ("y", "a b c d e f"), ("z", "q r s t u v"))
      .toDF("id", "text")
      .select(col("id"), Text.minhashSignature(
        Text.shingles(Text.tokens(col("text")), 3), 16).as("sig"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m("x") === m("y"))
    assert(m("x") !== m("z"))
  }

  test("slice-form and element_at-form shingles are identical (both n regimes)") {
    import graft.functions.Text
    val base = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    // n=13 takes the slice branch, n=3 the element_at branch; cross-check
    // each against a reference built with the OTHER construction
    def ref(n: Int) = base.select(col("doc_id"),
      when(size(col("toks")) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), size(col("toks")) - (n - 1)), i =>
          concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j)): _*)))
        .as("s"))
    def refSlice(n: Int) = base.select(col("doc_id"),
      when(size(col("toks")) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), size(col("toks")) - (n - 1)), i =>
          concat_ws(" ", slice(col("toks"), i, lit(n))))).as("s"))
    for (n <- Seq(3, 13)) {
      val got = base.select(col("doc_id"), Text.shinglesPositional(col("toks"), n).as("s"))
      assert(got.exceptAll(ref(n)).isEmpty && ref(n).exceptAll(got).isEmpty, s"n=$n vs element_at")
      assert(got.exceptAll(refSlice(n)).isEmpty && refSlice(n).exceptAll(got).isEmpty, s"n=$n vs slice")
    }
  }
}
