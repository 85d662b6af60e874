package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** q136 count-min sketch: the never-underestimates guarantee, additive
  * mergeability (the per-segment/per-batch artifact property), and a
  * driver-side recompute of the probed cells. */
class CountMinSpec extends SparkSpec {

  private def grams = Tables.load(spark, sf, "documents")
    .select(Text.tokens(col("text")).as("toks"))
    .select(explode(Text.shinglesPositional(col("toks"), 3)).as("t"))

  test("estimates never undercount and equal a driver-side recompute") {
    val out = CountMin.tokenFreqAudit(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated ${r.getString(0)}")
      assert(r.getLong(3) == (r.getLong(2) - r.getLong(1)) * 1000000L / r.getLong(1))
    }
    // independent recompute of one probed gram's estimate from raw grams
    import graft.functions.PortableHash.{P, slotA, slotB}
    val all = grams.collect().map(_.getString(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(sv: String): Long = java.lang.Long.parseLong(
      md.digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    def pos(i: Int, sv: String): Long =
      ((slotA(i) * (h60(sv) % P) + slotB(i)) % P) % CountMin.W
    val probe = out.head.getString(0)
    val est = (1 to CountMin.D).map { i =>
      val p = pos(i, probe)
      all.count(g => pos(i, g) == p).toLong
    }.min
    assert(est == out.head.getLong(2),
      s"driver recompute $est != sketch ${out.head.getLong(2)}")
  }

  test("sketches merge by addition: sketch(A ⊎ B) == sketch(A) + sketch(B)") {
    val a = grams.filter(length(col("t")) % 2 === 0)
    val b = grams.filter(length(col("t")) % 2 === 1)
    def toMap(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("CAST(i AS BIGINT) AS i", "CAST(pos AS BIGINT) AS pos",
        "CAST(c AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = toMap(CountMin.sketch(a)
      .unionByName(CountMin.sketch(b))
      .groupBy(col("i"), col("pos")).agg(sum(col("c")).as("c")))
    val whole = toMap(CountMin.sketch(grams))
    assert(merged == whole)
  }

  test("q143 incremental: per-segment sketches folded by addition equal batch") {
    import spark.implicits._
    // the doc's incremental claim as a proof: split the event stream in
    // three uneven segments, sketch each side per segment, fold cells by
    // SUM — the estimate from folded cells must equal the batch estimate
    // bit-for-bit (cells are additive; no approximation in the fold)
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("event_id"))
    val ids = ev.select(col("event_id")).orderBy(col("event_id")).collect()
      .map(_.getLong(0))
    val cuts = Seq(ids.length / 5, ids.length / 2)
    val segs = Seq(
      ev.filter(col("event_id") <= ids(cuts(0))),
      ev.filter(col("event_id") > ids(cuts(0)) &&
        col("event_id") <= ids(cuts(1))),
      ev.filter(col("event_id") > ids(cuts(1))))
    def cells(df: org.apache.spark.sql.DataFrame, t: String) = {
      val keyed = df.filter(col("event_type") === t)
        .select((graft.functions.PortableHash.h60(col("user_id")
          .cast("string")) % graft.functions.PortableHash.P).as("h"))
      val rows = (1 to CountMin.D).map(i =>
        struct(lit(i).as("i"),
          (graft.functions.PortableHash.slotHash(i, col("h")) % CountMin.JW)
            .as("pos")))
      keyed.select(explode(array(rows: _*)).as("r"))
        .groupBy(col("r.i").as("i"), col("r.pos").as("pos"))
        .agg(count(lit(1)).as("c"))
    }
    def fold(t: String) = segs.map(cells(_, t)).reduce(_ unionByName _)
      .groupBy(col("i"), col("pos")).agg(sum(col("c")).as("c"))
    val est = fold("view").as("a")
      .join(fold("purchase").as("b"),
        col("a.i") === col("b.i") && col("a.pos") === col("b.pos"))
      .groupBy(col("a.i")).agg(sum(col("a.c") * col("b.c")).as("ip"))
      .agg(min(col("ip"))).head.getLong(0)
    val batch = CountMin.joinSizeEstimate(spark, sf).head.getLong(6)
    assert(est === batch, s"incremental fold diverged: $est vs $batch")
  }

  test("q143 join-size estimate: never under, exact under no collisions") {
    // real data: est >= exact (collisions only add), and the reported
    // min-over-depths really is the min of the three inner products
    val r = CountMin.joinSizeEstimate(spark, sf).head()
    val (exact, d1, d2, d3, est) =
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(est >= exact, s"CM inner product undercounted: $est < $exact")
    assert(est === Seq(d1, d2, d3).min)
    assert(r.getLong(7) === (est - exact) * 1000000L / exact)
    // driver-side exact recompute of the join size
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(row => (row.getLong(0), row.getString(1)))
    val ca = ev.filter(_._2 == "view").groupBy(_._1).view.mapValues(_.length)
    val cb = ev.filter(_._2 == "purchase").groupBy(_._1).view
      .mapValues(_.length)
    val lit = ca.toSeq.map { case (u, c) => c.toLong * cb.getOrElse(u, 0) }
      .sum
    assert(exact === lit)
  }
}
