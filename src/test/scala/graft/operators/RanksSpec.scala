package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RanksSpec extends SparkSpec {

  test("globalRowNumber equals single-window row_number, ungrouped") {
    val o = graft.Tables.load(spark, sf, "orders").select(
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderkey"))
    val dist = Ranks.globalRowNumber(o, Nil, Seq("cents", "o_orderkey"))
      .select(col("o_orderkey"), col("rnk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("cents"), col("o_orderkey"))
    val single = o.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("o_orderkey"), col("rnk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === single)
  }

  test("globalRowNumber grouped: matches per-group window and is " +
      "partition-count invariant") {
    val e = graft.Tables.load(spark, sf, "events").select(
      col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v"), col("event_id"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1)) -> r.getLong(2)
    val d4 = Ranks.globalRowNumber(e, Seq("event_type"),
        Seq("v", "event_id"), partitions = 4)
      .select(col("event_type"), col("event_id"), col("rnk"))
      .collect().map(key).toMap
    val d13 = Ranks.globalRowNumber(e, Seq("event_type"),
        Seq("v", "event_id"), partitions = 13)
      .select(col("event_type"), col("event_id"), col("rnk"))
      .collect().map(key).toMap
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("event_id"))
    val single = e.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("event_type"), col("event_id"), col("rnk"))
      .collect().map(key).toMap
    assert(d4 === single)
    assert(d13 === single, "rank depends on partition count")
  }

  test("q118 equi-depth: buckets balanced ±1, bounds nested, mass conserved") {
    val rows = Ranks.equiDepthHistogram(spark, sf, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq === (0L until 16L))
    val counts = rows.map(_._2)
    assert(counts.max - counts.min <= 1, s"unbalanced: ${counts.toSeq}")
    // bucket value ranges are non-overlapping and ordered (equal cents can
    // straddle a boundary, so adjacent hi/lo may touch but never invert)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bucket ${a._1} hi > bucket ${b._1} lo") }
    val o = graft.Tables.load(spark, sf, "orders")
    assert(rows.map(_._2).sum === o.count())
    val total = o.agg(sum(expr(
      "CAST(round(o_totalprice * 100) AS BIGINT)"))).head.getLong(0)
    assert(rows.map(_._5).sum === total, "mass not conserved")
  }

  test("q123 spearman: rho recomputes literally per brand via BigInt") {
    val parts = graft.Tables.load(spark, sf, "part").select(
        col("p_brand"), col("p_size"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"),
        col("p_partkey"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    val got = Ranks.spearmanBrands(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (brand, n, sumD2, rho) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      val g = parts.filter(_._1 == brand)
      assert(n === g.length)
      val rSize = g.sortBy(x => (x._2, x._4)).zipWithIndex
        .map { case (x, i) => x._4 -> (i + 1L) }.toMap
      val rPrice = g.sortBy(x => (x._3, x._4)).zipWithIndex
        .map { case (x, i) => x._4 -> (i + 1L) }.toMap
      val expD2 = g.map(x => { val d = rSize(x._4) - rPrice(x._4); d * d }).sum
      assert(sumD2 === expD2, s"$brand sum_d2")
      val expRho = BigInt(1000000) -
        (BigInt(6000000) * expD2) / (BigInt(n) * (n * n - 1))
      assert(rho === expRho.toLong, s"$brand rho")
      assert(rho <= 1000000L && rho >= -1000000L)
    }
  }

  test("globalRunningSum equals the window prefix sum, grouped and not") {
    val li = graft.Tables.load(spark, sf, "lineitem").select(
      col("l_returnflag"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
      expr("CAST(round(l_quantity) AS BIGINT)").as("w"),
      col("l_orderkey"), col("l_linenumber"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1)) -> r.getLong(2)
    val dist = Ranks.globalRunningSum(li, Seq("l_returnflag"),
        Seq("cents", "l_orderkey", "l_linenumber"), "w", partitions = 13)
      .select(col("l_orderkey"), col("l_linenumber"), col("cum"))
      .collect().map(key).toMap
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val single = li.withColumn("cum", sum(col("w")).over(w))
      .select(col("l_orderkey"), col("l_linenumber"), col("cum"))
      .collect().map(key).toMap
    assert(dist === single)
  }

  test("q126 weighted median: half the units sit at or below it") {
    val rows = Ranks.weightedMedian(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val li = graft.Tables.load(spark, sf, "lineitem").select(
        col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (rf, med, totUnits, nLines) =>
      val g = li.filter(_._1 == rf)
      assert(totUnits === g.map(_._3).sum)
      assert(nLines === g.length.toLong)
      val below = g.filter(_._2 < med).map(_._3).sum
      val atOrBelow = g.filter(_._2 <= med).map(_._3).sum
      assert(2 * atOrBelow >= totUnits, s"$rf: median too low")
      assert(2 * below < totUnits, s"$rf: median too high")
    }
  }

  test("q127 concentration: Gini recomputes via BigInt; bounds hold") {
    val got = Ranks.revenueConcentration(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    val rev = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.load(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (nation, n, revCents, giniPpm, topPpm) =>
      val g = rev.filter(_._1 == nation).sortBy(x => (x._3, x._2))
      assert(n === g.length.toLong)
      val xs = g.map(_._3)
      assert(revCents === xs.sum)
      val six = xs.zipWithIndex
        .map { case (x, i) => BigInt(i + 1) * x }.sum
      val expGini = (BigInt(1000000) *
        (2 * six - BigInt(n + 1) * xs.sum)) / (BigInt(n) * xs.sum)
      assert(giniPpm === expGini.toLong, s"$nation gini")
      assert(giniPpm >= 0 && giniPpm < 1000000L)
      val topRev = xs.takeRight((n / 10).toInt).map(BigInt(_)).sum
      assert(topPpm === (topRev * 1000000 / xs.sum).toLong, s"$nation top")
      // the top decile holds at least its proportional share
      assert(topPpm >= (n / 10) * 1000000L / n || n < 10)
    }
  }

  test("distributed rank spreads the sort the window form funnels " +
      "through one task (measured)") {
    // the q89 single-reducer trap, measured: rank the full orders table
    // both ways and read where each row was materialized — for the
    // window form EVERY row sits in one partition (one task sorts the
    // world); globalRowNumber's max task share stays near 1/partitions
    val o = graft.Tables.load(spark, sf, "orders").select(
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderkey"))
    def shares(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.withColumn("__where", spark_partition_id())
        .groupBy(col("__where")).count()
        .collect().map(_.getLong(1))
    val w = Window.orderBy(col("cents"), col("o_orderkey"))
    val windowShares = shares(o.withColumn("rnk", row_number().over(w)))
    val distShares = shares(Ranks.globalRowNumber(o, Nil,
      Seq("cents", "o_orderkey"), partitions = 8))
    val n = o.count().toDouble
    assert(windowShares.max / n === 1.0,
      "window rank should funnel every row through one task")
    assert(distShares.max / n < 0.5,
      s"distributed rank should spread: ${distShares.toSeq}")
    assert(distShares.length >= 4, "expected multiple populated partitions")
  }

  test("rank/scan degenerate inputs: empty and single-row frames flow") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "v", "k")
    assert(Ranks.globalRowNumber(empty, Seq("g"), Seq("v", "k")).count() === 0L)
    assert(Ranks.globalRunningSum(empty, Seq("g"), Seq("v", "k"), "v")
      .count() === 0L)
    val one = Seq(("a", 7L, 1L)).toDF("g", "v", "k")
    val r = Ranks.globalRowNumber(one, Seq("g"), Seq("v", "k")).collect().head
    assert(r.getAs[Long]("rnk") === 1L)
    val c = Ranks.globalRunningSum(one, Seq("g"), Seq("v", "k"), "v")
      .collect().head
    assert(c.getAs[Long]("cum") === 7L)
  }

  test("q120 robust outliers: median/MAD recompute literally per group") {
    val got = Ranks.robustOutliers(spark, sf).collect()
    assert(got.nonEmpty)
    val e = graft.Tables.load(spark, sf, "events").select(
        col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { r =>
      val (ty, n, med, mad, nOut) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val g = e.filter(_._1 == ty).sortBy(x => (x._2, x._3))
      assert(n === g.length)
      val expMed = g(((n + 1) / 2 - 1).toInt)._2
      assert(med === expMed, s"$ty median")
      val devs = g.map(x => (math.abs(x._2 - med), x._3)).sorted
      assert(mad === devs(((n + 1) / 2 - 1).toInt)._1, s"$ty MAD")
      assert(nOut === g.count(x => math.abs(x._2 - med) > 3 * mad), s"$ty outliers")
    }
  }
}
