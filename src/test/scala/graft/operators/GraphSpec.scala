package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("q98 basket pairs: supports nest and scores recompute literally") {
    val rows = Graph.basketPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val nOrders = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    rows.foreach { case (p1, p2, pct, ct1, ct2, conf, lift) =>
      assert(p1 < p2, "pair orientation broken")
      assert(pct >= 2 && pct <= math.min(ct1, ct2),
        s"($p1,$p2): joint support outside item supports")
      assert(conf === pct * 1000000L / ct1)
      assert(lift === pct * nOrders * 1000000L / (ct1 * ct2))
    }
  }

  test("q99 triangles: per-node counts from a planted-clique fixture") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus pendant edge (4,5): C(4,3)=4 triangles,
    // each of 1..4 in exactly 3, node 5 in none
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("p1", "p2")
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.p2") === col("e2.p1"))
      .join(edges.as("e3"),
        col("e3.p1") === col("e1.p1") && col("e3.p2") === col("e2.p2"))
      .select(col("e1.p1").as("a"), col("e1.p2").as("b"), col("e2.p2").as("c"))
    val perNode = tri.select(explode(array(col("a"), col("b"), col("c"))).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri.count() === 4L)
    assert(perNode === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("q112 pagerank: star-fixture masses match a literal integer recompute") {
    import spark.implicits._
    // hub 1 connected to 2,3,4,5 (star): hub must dominate, and every
    // mass must equal the exact integer recurrence computed driver-side
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("p1", "p2")
    val got = Graph.pagerankFrom(edges, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side recompute of the identical recurrence
    val adj = Map(1L -> Seq(2L, 3L, 4L, 5L), 2L -> Seq(1L), 3L -> Seq(1L),
      4L -> Seq(1L), 5L -> Seq(1L))
    val deg = adj.map { case (k, v) => k -> v.length.toLong }
    var m = adj.keys.map(_ -> 1000000000000L).toMap
    (1 to 5).foreach { _ =>
      m = adj.keys.map { i =>
        val inflow = adj.filter(_._2.contains(i)).keys.toSeq
          .map(j => m(j) / deg(j)).sum
        i -> (150000000000L + 85L * inflow / 100L)
      }.toMap
    }
    assert(got === m)
    assert(got(1L) > got(2L) * 2, "hub should dominate leaves")
    assert(Seq(2L, 3L, 4L, 5L).map(got).distinct.size === 1, "leaves symmetric")
  }

  test("q112 on real data: deterministic across runs, hubs outrank leaves") {
    val a = Graph.pagerank(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Graph.pagerank(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq, "pagerank not deterministic")
    assert(a.nonEmpty)
    // every node keeps at least the teleport mass
    a.foreach { case (pk, mass) => assert(mass >= 150000000000L, s"$pk lost teleport mass") }
  }

  test("q99 on real data: counts positive and nodes are thresholded-edge endpoints") {
    val tri = Graph.triangleCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edgeNodes = Graph.pairFrame(spark, sf).select(
        explode(array(col("p1"), col("p2"))).as("pk"))
      .distinct().collect().map(_.getLong(0)).toSet
    tri.foreach { case (pk, ct) =>
      assert(ct >= 1L)
      assert(edgeNodes.contains(pk), s"$pk not on any thresholded edge")
    }
  }
}
