package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental multi-touch attribution (q144's deployment shape):
  * streamed per-credit rows and the derived report equal batch q144. */
class MultiTouchStreamSpec extends SparkSpec {

  private def creditRows(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getDouble(1),
      Option(if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))),
      r.getString(3), r.getString(4), r.getLong(5))).toSet

  test("streamed credits across uneven splits equal batch q144 (real stream)") {
    val s = spark
    val evDf = graft.Tables.load(s, sf, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"),
        col("event_type"), col("value"))
    val ev = evDf.orderBy(col("us"), col("event_id")).collect()
    // µs-aligned batch boundaries (the mergeBatch contract)
    def align(i: Int): Int = {
      var j = i
      while (j > 0 && j < ev.length && ev(j).getLong(2) == ev(j - 1).getLong(2))
        j += 1
      j
    }
    val cuts = (Seq(0, 271, 1500, 2800).map(align) :+ ev.length)
      .distinct.sorted
    var st = MultiTouchStream.emptyState(s)
    var credits = Set.empty[(Long, Double, Option[java.lang.Long], String,
      String, Long)]
    import s.implicits._
    cuts.sliding(2).foreach {
      case Seq(a, b) =>
        val batch = ev.slice(a, b).toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getString(3), r.getDouble(4)))
          .toDF("event_id", "user_id", "us", "event_type", "value")
        val (ns, c) = MultiTouchStream.mergeBatch(st, batch)
        st = ns.localCheckpoint(true)
        credits = credits ++ creditRows(c.localCheckpoint(true))
      case _ => ()
    }
    val batchCredits = creditRows(graft.operators.RefQueries
      .multiTouchCredits(graft.operators.RefQueries.multiTouchJoin(
        evDf.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id").as("puser"),
            col("us").as("pus"), col("value")),
        evDf.filter(col("event_type").isin("view", "click"))
          .select(col("event_id").as("tid"), col("user_id").as("tuser"),
            col("us").as("tus"), col("event_type").as("touch_type")),
        72L * 3600 * 1000000L)))
    assert(credits === batchCredits)
    // non-degenerate: the stream produced multi-touch splits, not just
    // organic/only rows
    assert(credits.exists(_._5 == "middle"))
  }

  test("state stays lookback-bounded and cross-batch windows credit exactly") {
    val s = spark
    import s.implicits._
    def df(rows: Seq[(Long, Long, Long, String, Double)]) =
      rows.toDF("event_id", "user_id", "us", "event_type", "value")
    // lookback 1000: u1's view@100 must credit purchase@900 (cross-batch)
    // but NOT purchase@1500 (expired); u2 accumulates touches across
    // batches and the purchase sees all of them in order
    val b1 = Seq((1L, 1L, 100L, "view", 0.0), (10L, 2L, 100L, "view", 0.0))
    val b2 = Seq((2L, 1L, 900L, "purchase", 5.0),
      (11L, 2L, 300L, "click", 0.0), (12L, 2L, 600L, "view", 0.0))
    val b3 = Seq((3L, 1L, 1500L, "purchase", 7.0),
      (13L, 2L, 700L, "purchase", 9.0))
    var st = MultiTouchStream.emptyState(s)
    var out = Set.empty[(Long, Double, Option[java.lang.Long], String,
      String, Long)]
    Seq(b1, b2, b3).foreach { b =>
      val (ns, c) = MultiTouchStream.mergeBatch(st, df(b), lookbackUs = 1000L)
      st = ns.localCheckpoint(true)
      out = out ++ creditRows(c.localCheckpoint(true))
    }
    assert(out === Set(
      (2L, 5.0, Some(java.lang.Long.valueOf(1L)), "view", "only", 1000000L),
      (3L, 7.0, None, "none", "organic", 1000000L),
      // u2: three touches -> first/middle/last = 400000/200000/400000
      (13L, 9.0, Some(java.lang.Long.valueOf(10L)), "view", "first", 400000L),
      (13L, 9.0, Some(java.lang.Long.valueOf(11L)), "click", "middle", 200000L),
      (13L, 9.0, Some(java.lang.Long.valueOf(12L)), "view", "last", 400000L)))
    // after batch 3 (frontier 1500, lookback 1000): only touches newer
    // than 500 survive the prune
    val stRows = st.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stRows === Set((2L, 600L)))
  }
}
