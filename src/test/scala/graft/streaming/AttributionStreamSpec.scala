package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class AttributionStreamSpec extends SparkSpec {

  private def attrRows(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getString(4))).toSet

  test("streamed attribution across micro-batches equals batch q93") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val stage = java.nio.file.Files.createTempDirectory("graft-attr").toString
    val statePath = s"$stage/state"
    val outPath = s"$stage/attributed"

    val evDf = graft.Tables.load(s, sf, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"),
        col("event_type"), col("value"))
    val ev = evDf.orderBy(col("us"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))

    // batch boundaries on µs edges (the mergeBatch contract): nudge each
    // cut forward past any µs group it would split
    def align(i: Int): Int = {
      var j = i
      while (j > 0 && j < ev.length && ev(j)._3 == ev(j - 1)._3) j += 1
      j
    }
    val cuts = (Seq(0, 313, 2000, 2001, ev.length).map(align) :+ ev.length)
      .distinct.sorted

    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val q = input.toDF()
      .toDF("event_id", "user_id", "us", "event_type", "value").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prior =
          if (new java.io.File(statePath).exists) s.read.parquet(statePath)
          else AttributionStream.emptyState(s)
        val (st, attributed) = AttributionStream.mergeBatch(prior, batch)
        // materialize BOTH results before the state overwrite deletes the
        // files the lazy plans still reference
        val attrC = attributed.localCheckpoint(true)
        val stC = st.localCheckpoint(true)
        attrC.write.mode("append").parquet(outPath)
        stC.write.mode("overwrite").parquet(statePath)
        (): Unit
      }.start()
    try {
      cuts.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) { input.addData(ev.slice(a, b): _*); q.processAllAvailable() }
      }
    } finally q.stop()

    val streamed = attrRows(s.read.parquet(outPath))
    val batch = attrRows(graft.operators.RefQueries.attributedPurchases(evDf))
    assert(streamed === batch)
    assert(batch.map(_._5) === Set("view", "click", "organic")) // non-degenerate
  }

  test("cross-batch semantics: ties, expiry, and untouched state") {
    val s = spark
    import s.implicits._
    def df(rows: Seq[(Long, Long, Long, String, Double)]) =
      rows.toDF("event_id", "user_id", "us", "event_type", "value")
    val b1 = Seq((1L, 1L, 100L, "view", 0.0), (2L, 2L, 100L, "click", 0.0),
      (3L, 3L, 100L, "view", 0.0), (8L, 4L, 100L, "click", 0.0),
      (20L, 5L, 50L, "view", 0.0))
    val b2 = Seq((4L, 1L, 150L, "click", 0.0), (5L, 1L, 500L, "purchase", 10.0),
      // u3: purchase at the SAME µs as a touch from the PREVIOUS batch
      (7L, 3L, 100L, "purchase", 5.0),
      // u4: second touch in the tied µs arrives a batch later; its higher
      // event_id must still win the tie via the state's carried t_eid
      (9L, 4L, 100L, "view", 0.0))
    val b3 = Seq((6L, 2L, 5000L, "purchase", 20.0),
      (10L, 4L, 200L, "purchase", 7.0))
    var st = AttributionStream.emptyState(s)
    var out = Set.empty[(Long, Long, Long, Double, String)]
    Seq(b1, b2, b3).foreach { b =>
      val (ns, attributed) = AttributionStream.mergeBatch(st, df(b),
        lookbackUs = 1000L)
      st = ns.localCheckpoint(true)
      out = out ++ attrRows(attributed)
    }
    assert(out === Set(
      (5L, 1L, 500L, 10.0, "click"),  // fresh click beats older view
      (7L, 3L, 100L, 5.0, "view"),    // same-µs touch from a prior batch
      (6L, 2L, 5000L, 20.0, "organic"), // state exists but lookback expired
      (10L, 4L, 200L, 7.0, "view")))  // cross-batch tie -> higher event_id
    // equality with the one-shot batch computation over the same events
    val batch = attrRows(graft.operators.RefQueries.attributedPurchases(
      df(b1 ++ b2 ++ b3), lookbackUs = 1000L))
    assert(out === batch)
    // u5 was never touched after batch 1: its state row rides through
    val u5 = st.filter(col("user_id") === 5L).collect()
    assert(u5.length === 1 && u5(0).getLong(1) === 50L)
  }
}
