package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized-trial invariants (fixed seed — deterministic in CI) for the
  * portable primitives everything else is built on: the KMV sketch's
  * partition invariance / below-k exactness across random multisets, and
  * the portable-hash range contracts the oracle SQL generation relies on.
  */
class PropertySpec extends SparkSpec {

  test("KMV: partition-invariant and exact below k across random multisets") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(12345)
    val kmv = KmvDistinct.columnAgg(64)
    for (trial <- 1 to 5) {
      val nDistinct = 1 + rng.nextInt(300)
      val rows = (1 to 800).map(_ => ("g", s"t${trial}v${rng.nextInt(nDistinct)}"))
      val actual = rows.map(_._2).distinct.size.toLong
      def run(parts: Int): Long =
        rows.toDF("g", "v").repartition(parts)
          .select(col("g"), PortableHash.h60(col("v")).as("h"))
          .groupBy("g").agg(kmv(col("h")).as("est")).head().getLong(1)
      val ests = Seq(1, 7, 32).map(run)
      assert(ests.distinct.size === 1,
        s"trial $trial: estimate depends on partitioning: $ests")
      if (actual < 64) assert(ests.head === actual,
        s"trial $trial: below-k must be exact ($actual got ${ests.head})")
      else assert(math.abs(ests.head - actual.toDouble) / actual < 0.6,
        s"trial $trial: est ${ests.head} too far from $actual")
    }
  }

  test("rank/scan: random frames match window forms across partitionings") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(424242)
    for (trial <- 1 to 4) {
      // heavy ties on purpose: few distinct values, few groups, unique key
      val nGroups = 1 + rng.nextInt(4)
      val rows = (1 to (100 + rng.nextInt(400))).map { i =>
        (s"g${rng.nextInt(nGroups)}", rng.nextInt(8).toLong, i.toLong,
          1L + rng.nextInt(9))
      }
      val df = rows.toDF("g", "v", "k", "w").repartition(1 + rng.nextInt(6))
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v"), col("k"))
      val expRank = df.withColumn("e", row_number().over(wr).cast("long"))
        .select(col("k"), col("e")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expCum = df.withColumn("e", sum(col("w")).over(
          wr.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)))
        .select(col("k"), col("e")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (parts <- Seq(2, 5)) {
        val gotRank = graft.operators.Ranks.globalRowNumber(df, Seq("g"),
            Seq("v", "k"), partitions = parts)
          .select(col("k"), col("rnk")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotRank === expRank, s"trial $trial parts $parts rank")
        val gotCum = graft.operators.Ranks.globalRunningSum(df, Seq("g"),
            Seq("v", "k"), "w", partitions = parts)
          .select(col("k"), col("cum")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotCum === expCum, s"trial $trial parts $parts cum")
      }
    }
  }

  test("portable hash: h60 in [0, 2^60), deterministic; slot hashes in [0, P)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(67890)
    val strs = (1 to 500).map(_ => rng.alphanumeric.take(1 + rng.nextInt(30)).mkString)
    def hashes(slot: Int): Seq[(Long, Long)] = strs.toDF("v")
      .select(PortableHash.h60(col("v")).as("h"),
        PortableHash.slotHash(slot, PortableHash.h60(col("v")) % PortableHash.P).as("sh"))
      .collect().toIndexedSeq.map(r => (r.getLong(0), r.getLong(1)))
    val first = hashes(slot = 17)
    first.foreach { case (h, sh) =>
      assert(h >= 0L && h < (1L << 60), s"h60 out of range: $h")
      assert(sh >= 0L && sh < PortableHash.P, s"slot hash out of range: $sh")
    }
    // re-evaluation is bit-identical (the whole oracle strategy rests on it)
    assert(hashes(slot = 17) === first)
    // distinct slots draw distinct hash functions
    assert(hashes(slot = 18).map(_._2) !== first.map(_._2))
  }

  test("q178 chunk grid: coverage/count/length invariants over random docs") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(987654)
    val (c, st) = (64, 48)
    // token counts spanning every regime: empty, sub-chunk, exact
    // boundary, off-by-one around starts, large
    val ns = Seq(0, 1, 63, 64, 65, 111, 112, 113, 160, 161) ++
      (1 to 10).map(_ => rng.nextInt(1000))
    val docs = ns.zipWithIndex.map { case (n, i) =>
      (i.toLong, s"src${i % 3}", (1 to n).map(j => s"t$j").mkString(" "))
    }
    val rows = graft.operators.TextQueries
      .chunkRows(docs.toDF("doc_id", "source", "text"), c, st)
      .select(col("source"), col("clen")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    def expectedChunks(n: Int): Seq[Int] =
      if (n == 0) Nil
      else if (n <= c) Seq(n)
      else {
        val nCh = 1 + (n - c + st - 1) / st
        (0 until nCh).map(i => math.min(c, n - i * st))
      }
    val exp = docs.flatMap { case (_, src, text) =>
      val n = if (text.isEmpty) 0 else text.split(" ").length
      expectedChunks(n).map(src -> _.toLong)
    }
    assert(rows.sorted.toSeq === exp.sorted,
      "chunk multiset (source, length) mismatch")
    // coverage: sum of (clen - overlap) per doc ≥ n guarantees no token
    // is skipped; verified structurally by expectedChunks: last start
    // 1 + (nCh-1)*st <= n and start+c-1 >= n
    ns.filter(_ > c).foreach { n =>
      val nCh = 1 + (n - c + st - 1) / st
      assert(1 + (nCh - 1) * st <= n, s"n=$n: start beyond doc")
      assert((nCh - 1) * st + c >= n, s"n=$n: tail uncovered")
    }
  }
}
