package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** MEASURED shuffle-volume proofs for the bounded-state designs.
  *
  * PlanSpec asserts plan SHAPES (broadcast, pushdown, group-limit); this
  * spec asserts the scale claims as recorded bytes: the KMV sketch's
  * shuffle must stay a small constant per (group, partition) regardless of
  * how many distinct values flow in, and sequence packing must shuffle
  * per-doc metadata, never document text. These are the numbers that decide
  * whether a query survives a 100× corpus, measured instead of argued.
  */
class ShuffleVolumeSpec extends SparkSpec {

  /** Total bytes written to shuffle by one execution of `mk`. AQE is
    * disabled for the measurement so the executed plan carries plain
    * ShuffleExchangeExec nodes whose SQLMetrics we can read directly. */
  private def shuffledBytes(mk: => DataFrame): Long = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = mk
      // execute through THIS QueryExecution (df.write would plan a separate
      // one and leave these metrics untouched); outputs here are row-counted
      // in the hundreds, so the driver collect is metadata-sized
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec =>
          s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
      }.sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("KMV UV shuffle bytes stay flat while exact-distinct's grow 10x") {
    // q06 exact: every distinct (day, user_id) crosses the wire — bytes
    // grow with the distinct count. q51 sketch: <= k=64 longs per
    // (day, partition) — bytes are a constant of the layout. The scale
    // claim IS the growth-rate difference, so measure both SFs and assert
    // the slopes, not one ratio at one size.
    val exactSmall = shuffledBytes(RefQueries.uvPerDay(spark, sf))
    val exactBig = shuffledBytes(RefQueries.uvPerDay(spark, "/root/testdata/sf0.01"))
    val sketchSmall = shuffledBytes(RefQueries.uvPerDayApprox(spark, sf))
    val sketchBig = shuffledBytes(RefQueries.uvPerDayApprox(spark, "/root/testdata/sf0.01"))
    assert(exactSmall > 0 && sketchSmall > 0,
      s"no shuffle measured: $exactSmall / $sketchSmall")
    // exact grows substantially with 10x the events
    assert(exactBig > exactSmall * 3,
      s"exact shuffle did not scale with data: $exactSmall -> $exactBig B")
    // the sketch's shuffle is size-capped: near-flat across the same 10x
    assert(sketchBig < sketchSmall * 2,
      s"KMV shuffle grew with data ($sketchSmall -> $sketchBig B) — state not bounded")
    // and at the larger SF the sketch is decisively cheaper
    assert(sketchBig * 5 < exactBig,
      s"KMV shuffle ($sketchBig B) not materially below exact ($exactBig B) at sf0.01")
  }

  test("q100 overlap shuffle stays sketch-sized while segments grow 10x") {
    // the two bottom-k segment sketches are the ONLY aggregation state
    // that crosses the wire for the estimate path; the exact companions
    // ride a user-keyed aggregate that grows with the user universe. The
    // TOTAL therefore grows with users — but removing the exact columns
    // must leave a near-flat sketch shuffle. Measure the sketch-only
    // fragment at two SFs.
    import graft.functions.{KmvDistinct, PortableHash}
    def sketchOnly(dir: String): DataFrame = {
      val ev = graft.Tables.load(spark, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("event_type"),
          PortableHash.h60(col("user_id").cast("string")).as("h"))
      val sk = KmvDistinct.sketchAgg(64)
      ev.filter(col("event_type") === "view").agg(sk(col("h")).as("sa"))
        .crossJoin(ev.filter(col("event_type") === "purchase")
          .agg(sk(col("h")).as("sb")))
        .select(size(col("sa")).as("na"), size(col("sb")).as("nb"))
    }
    val small = shuffledBytes(sketchOnly(sf))
    val big = shuffledBytes(sketchOnly("/root/testdata/sf0.01"))
    assert(small > 0, "no shuffle measured for the sketch aggregate")
    assert(big < small * 2 + 4096,
      s"sketch shuffle grew with segment size ($small -> $big B) — state not bounded")
  }

  test("q98 support enrichment must not re-shuffle the pair table") {
    // the unavoidable wire cost is pairFrame's: two incidence exchanges
    // for the orderkey self-join plus the distinct-pair support partials
    // (that IS the output domain). The item-support and order-count
    // enrichment joins are BROADCAST — adding them must cost only their
    // own dimension-sized aggregates, never a second pass of the pair
    // table through an exchange.
    val dir = "/root/testdata/sf0.01"
    val base = shuffledBytes(Graph.pairFrame(spark, dir))
    val full = shuffledBytes(Graph.basketPairs(spark, dir))
    assert(base > 0 && full >= base)
    assert(full < base * 3 / 2 + (1 << 20),
      s"enrichment grew shuffle $base -> $full B — pairs re-shuffled?")
  }

  test("sequence packing shuffles doc metadata, not document text") {
    val textBytes = graft.Tables.load(spark, sf, "documents")
      .agg(sum(length(col("text")))).head().getLong(0)
    val packed = shuffledBytes(Corpus.packAssign(spark, sf))
    assert(packed > 0, "no shuffle measured for packAssign")
    assert(packed * 5 < textBytes,
      s"packAssign shuffle ($packed B) is not small vs corpus text ($textBytes B) — " +
        "is text riding the layout shuffle?")
  }
}
