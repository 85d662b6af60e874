package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {

  test("q93 last-touch attribution on a hand-computed fixture") {
    import spark.implicits._
    val e = Seq(
      // u1: view then click then purchase -> last touch is the click
      (1L, 1L, 100L, "view", 0.0), (2L, 1L, 200L, "click", 0.0),
      (3L, 1L, 300L, "purchase", 10.0),
      // u2: touch exists but falls outside the 1000 µs lookback -> organic
      (4L, 2L, 100L, "view", 0.0), (5L, 2L, 2000L, "purchase", 20.0),
      // u3: no touch at all -> organic
      (6L, 3L, 500L, "purchase", 5.0),
      // u4: view and click in the SAME µs -> the higher event_id (the
      // view) wins the reduce, so credit goes to 'view'
      (10L, 4L, 100L, "click", 0.0), (11L, 4L, 100L, "view", 0.0),
      (12L, 4L, 400L, "purchase", 7.0),
      // u5: touch at EXACTLY the purchase µs counts (at-or-before)
      (13L, 5L, 300L, "view", 0.0), (14L, 5L, 300L, "purchase", 3.0),
      // u6: one click credits BOTH later purchases
      (15L, 6L, 100L, "click", 0.0), (16L, 6L, 200L, "purchase", 1.0),
      (17L, 6L, 900L, "purchase", 2.0),
      // u7: the LAST touch wins, not the first (view@180 after click@150)
      (18L, 7L, 100L, "view", 0.0), (19L, 7L, 150L, "click", 0.0),
      (20L, 7L, 180L, "view", 0.0), (21L, 7L, 500L, "purchase", 4.0))
      .toDF("event_id", "user_id", "us", "event_type", "value")
    val out = RefQueries.attributionFrom(e, lookbackUs = 1000L).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out === Seq(
      ("click", 3L, 13.0),   // u1 + u6's two purchases
      ("organic", 2L, 25.0), // u2 (expired lookback) + u3 (no touch)
      ("view", 3L, 14.0)))   // u4 (tie->view) + u5 (same-µs) + u7 (last)
  }

  test("q93 cross-foots against the raw purchase stream") {
    val dir = sf
    val rep = RefQueries.attributionReport(spark, dir).collect()
    val purchases = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), sum(col("value").cast("decimal(18,2)")).cast("double"))
      .collect()(0)
    assert(rep.map(_.getLong(2)).sum === purchases.getLong(0))
    assert(math.abs(rep.map(_.getDouble(3)).sum - purchases.getDouble(1)) < 1e-6)
    val channels = rep.map(_.getString(1)).toSet
    assert(channels.subsetOf(Set("view", "click", "organic")))
    // the 72 h lookback over a 30-day stream leaves some purchases organic
    // and credits some touches of both kinds
    assert(channels.contains("organic") && (channels - "organic").nonEmpty)
  }

  test("q144 U-shaped credits on a hand-computed fixture") {
    import spark.implicits._
    val e = Seq(
      // u1: 5 touches -> first/last 400000; 3 middles: 200000 div 3 =
      // 66666 r 2 -> middles at pos 2,3 get 66667, pos 4 gets 66666
      (1L, 1L, 100L, "view", 0.0), (2L, 1L, 200L, "click", 0.0),
      (3L, 1L, 300L, "view", 0.0), (4L, 1L, 400L, "click", 0.0),
      (5L, 1L, 500L, "view", 0.0), (6L, 1L, 600L, "purchase", 10.0),
      // u2: single touch -> 'only' gets the full million
      (7L, 2L, 100L, "click", 0.0), (8L, 2L, 200L, "purchase", 3.0),
      // u3: two touches -> 500000 each, classed first/last
      (9L, 3L, 100L, "view", 0.0), (10L, 3L, 150L, "click", 0.0),
      (11L, 3L, 300L, "purchase", 2.0),
      // u4: organic (touch outside the lookback)
      (12L, 4L, 100L, "view", 0.0), (13L, 4L, 5000L, "purchase", 7.0))
      .toDF("event_id", "user_id", "us", "event_type", "value")
    val out = RefQueries.multiTouchAttributionFrom(e, lookbackUs = 1000L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out === Seq(
      ("first", "view", 2L, 900000L),    // u1 400000 + u3 500000
      ("last", "click", 1L, 500000L),    // u3 (m=2 -> 500000, classed last)
      ("last", "view", 1L, 400000L),     // u1 pos 5
      ("middle", "click", 2L, 133333L),  // u1: 66667 (pos2) + 66666 (pos4)
      ("middle", "view", 1L, 66667L),    // u1 pos 3
      ("only", "click", 1L, 1000000L),   // u2
      ("organic", "none", 1L, 1000000L)))// u4
  }

  test("q144 per-purchase credit sums to exactly one million on real data") {
    val e = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"),
        col("event_type"), col("value"))
    // rebuild the per-credit frame (pre-report) and check the invariant
    val rep = RefQueries.multiTouchAttributionFrom(e).collect()
    val totalCredit = rep.map(_.getLong(3)).sum
    val nPurchases = e.filter(col("event_type") === "purchase").count()
    assert(totalCredit === nPurchases * 1000000L,
      s"credit leaked: $totalCredit vs ${nPurchases * 1000000L}")
    // micro-value cross-foot: total attributed micro == 1e6 x purchase value
    val totalMicro = rep.map(_.getDouble(4)).sum
    val purchaseValue = e.filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
      .head.getDouble(0)
    assert(math.abs(totalMicro - purchaseValue * 1e6) / (purchaseValue * 1e6)
      < 1e-9)
  }
}
