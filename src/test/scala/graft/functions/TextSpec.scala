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
}
