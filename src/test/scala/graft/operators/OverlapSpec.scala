package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OverlapSpec extends SparkSpec {

  test("q100: sketch estimates bracket the exact overlap") {
    val r = Overlap.audienceOverlap(spark, sf).collect().head
    val (nView, nBuy, nInter, unionEst, interEst) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val exactUnion = nView + nBuy - nInter
    assert(nInter <= math.min(nView, nBuy))
    assert(exactUnion >= math.max(nView, nBuy))
    // k=64 -> ~13% expected relative error; assert a generous 50% band so
    // the test pins correctness of the composition, not sketch luck
    assert(math.abs(unionEst - exactUnion).toDouble / exactUnion < 0.5,
      s"union est $unionEst vs exact $exactUnion")
    assert(interEst <= unionEst)
    if (nInter > 0)
      assert(math.abs(interEst - nInter).toDouble / nInter < 1.0,
        s"inter est $interEst vs exact $nInter")
  }

  test("q100 composition is exact below capacity (small segments)") {
    import spark.implicits._
    import graft.functions.{KmvDistinct, PortableHash}
    // two segments with 10 and 8 users, 5 common: union 13 < k=64 so the
    // sketches are complete and estimates must EQUAL the exact values
    val rows =
      (1L to 10L).map(u => (u, "view")) ++ (6L to 13L).map(u => (u, "purchase"))
    val ev = rows.toDF("user_id", "event_type")
      .select(col("user_id"), col("event_type"),
        PortableHash.h60(col("user_id").cast("string")).as("h"))
    val sk = KmvDistinct.sketchAgg(64)
    val sa = ev.filter(col("event_type") === "view").agg(sk(col("h")).as("sa"))
    val sb = ev.filter(col("event_type") === "purchase").agg(sk(col("h")).as("sb"))
    val out = sa.crossJoin(sb)
      .withColumn("u", slice(array_sort(array_distinct(concat(col("sa"), col("sb")))), 1, 64))
      .select(size(col("u")).as("nd"),
        size(expr("filter(u, x -> array_contains(sa, x) AND array_contains(sb, x))")).as("common"))
      .collect().head
    assert(out.getInt(0) === 13)
    assert(out.getInt(1) === 5)
  }

  test("q101 fuzzy pairs: symmetric-free, thresholded, includes exact dups") {
    val pairs = Dedup.fuzzyHeadPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.foreach { case (a, b, d) =>
      assert(a < b, "pair orientation broken")
      assert(d >= 0 && d <= 5, s"($a,$b): distance $d outside threshold")
    }
    // exact-duplicate docs share identical heads -> distance 0 pairs must
    // appear (the synthetic corpus plants exact dups; q15 proves they exist)
    val exactDups = Dedup.exactDupGroups(spark, sf)
      .filter(col("dup_ct") >= 2).count()
    if (exactDups > 0) assert(pairs.exists(_._3 === 0L))
  }

  test("q101 distance semantics match a hand fixture") {
    import spark.implicits._
    val heads = Seq((1L, "hello world"), (2L, "hello w0rld"),
      (3L, "hello"), (4L, "completely different")).toDF("doc_id", "head")
    val out = heads.as("a").join(heads.as("b"),
        substring(col("a.head"), 1, 4) === substring(col("b.head"), 1, 4) &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.head"), col("b.head")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // blocking keeps 1-2, 1-3, 2-3 (same 'hell' prefix); doc 4 blocked out
    assert(out === Set((1L, 2L, 1), (1L, 3L, 6), (2L, 3L, 6)))
  }
}
