package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvDistinctSpec extends SparkSpec {

  test("KMV is exact below k and within tolerance above it") {
    val s = spark
    import s.implicits._
    val kmv = KmvDistinct.columnAgg(64)
    // 40 distinct (< k): exact
    val small = (1 to 200).map(i => ("g", s"v${i % 40}")).toDF("g", "v")
      .select(col("g"), PortableHash.h60(col("v")).as("h"))
      .groupBy("g").agg(kmv(col("h")).as("est")).head().getLong(1)
    assert(small === 40L)
    // 5000 distinct (>> k): estimate within 4 standard errors (~1/sqrt(62))
    val big = (1 to 5000).map(i => ("g", s"value$i")).toDF("g", "v")
      .select(col("g"), PortableHash.h60(col("v")).as("h"))
      .groupBy("g").agg(kmv(col("h")).as("est")).head().getLong(1)
    assert(math.abs(big - 5000.0) / 5000.0 < 0.5, s"estimate $big too far from 5000")
  }

  test("KMV estimate is invariant under partitioning (merge correctness)") {
    val s = spark
    import s.implicits._
    val kmv = KmvDistinct.columnAgg(64)
    def run(parts: Int): Long =
      (1 to 3000).map(i => ("g", s"item$i")).toDF("g", "v").repartition(parts)
        .select(col("g"), PortableHash.h60(col("v")).as("h"))
        .groupBy("g").agg(kmv(col("h")).as("est")).head().getLong(1)
    // partial sketches merge to the same k-minimum set regardless of split
    assert(run(1) === run(7))
    assert(run(7) === run(32))
  }

  test("q52 tracks exact province distinct counts; plan has map-side partials") {
    val q52 = graft.operators.RefQueries.provinceStatsApprox(spark, sf)
    val approx = q52.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val exact = graft.operators.RefQueries.provinceStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (key, (oc, cc)) =>
      val (oe, ce) = approx(key)
      if (oc < 64) assert(oe === oc) else assert(math.abs(oe - oc.toDouble) / oc < 0.5)
      if (cc < 64) assert(ce === cc) else assert(math.abs(ce - cc.toDouble) / cc < 0.5)
    }
    // the sketch aggregate must partial-combine map-side (an Aggregator
    // via udaf gets ObjectHashAggregate partial/final — the property that
    // keeps the shuffle at <= k longs per group per partition)
    val plan = q52.queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmvdistinct"),
      s"expected partial KMV aggregation in plan:\n$plan")
  }

  test("KMV aggregates in streaming mode and matches the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val kmv = KmvDistinct.columnAgg(64)
    val data = (1 to 600).map(i => ("g", s"user${i % 200}"))
    val in = MemoryStream[(String, String)]
    val agg = in.toDF().toDF("g", "v")
      .select(col("g"), PortableHash.h60(col("v")).as("h"))
      .groupBy(col("g")).agg(kmv(col("h")).as("est"))
    val q = agg.writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      // two micro-batches: the sketch state must merge across triggers
      in.addData(data.take(300): _*)
      q.processAllAvailable()
      in.addData(data.drop(300): _*)
      q.processAllAvailable()
      val streamed = s.table("kmv_stream").head().getLong(1)
      val batch = data.toDF("g", "v")
        .select(col("g"), PortableHash.h60(col("v")).as("h"))
        .groupBy(col("g")).agg(kmv(col("h")).as("est")).head().getLong(1)
      assert(streamed === batch)
      assert(math.abs(streamed - 200.0) / 200.0 < 0.5)
    } finally q.stop()
  }

  test("KMV distinct inside a watermark-emitted tumbling window (A4 twin)") {
    // the deployment shape for the bounded-state distinct count: a 10 s
    // event-time tumble in append mode — each window's sketch is sealed
    // and emitted when the watermark passes its end, exactly like the A4
    // province-stats tumble (VERDICT r4 ask #7). Window contents are
    // deliberately split across micro-batches so the sketch state must
    // merge across triggers before the window closes.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val kmv = KmvDistinct.columnAgg(64)
    // window [0,10s): 120 events over 80 users (> k: estimated);
    // window [10s,20s): 90 events over 30 users (< k: exact)
    val w1 = (1 to 120).map(i => (1000L + i, s"u${i % 80}"))
    val w2 = (1 to 90).map(i => (10500L + i, s"v${i % 30}"))
    val sentinel = Seq((60000L, "zz")) // advances the watermark past both
    def shaped(df: org.apache.spark.sql.DataFrame, streaming: Boolean) =
      graft.streaming.WindowedStats.tumble(
        df.toDF("ms", "user")
          .select(timestamp_millis(col("ms")).as("ts"),
            substring(col("user"), 1, 1).as("grp"),
            PortableHash.h60(col("user")).as("h")),
        "ts", Seq("grp"), Seq(kmv(col("h")).as("uv_est")),
        streaming = streaming)
    val in = MemoryStream[(Long, String)]
    val q = shaped(in.toDF(), streaming = true)
      .writeStream.format("memory").queryName("kmv_tumble")
      .outputMode(OutputMode.Append).start()
    try {
      // each window arrives half per trigger
      in.addData(w1.take(60) ++ w2.take(45): _*)
      q.processAllAvailable()
      in.addData(w1.drop(60) ++ w2.drop(45) ++ sentinel: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[String]("grp"), r.getAs[String]("stt")) -> r.getAs[Long]("uv_est")
      val streamed = s.table("kmv_tumble").collect().map(key).toMap
      val batch = shaped((w1 ++ w2).toDF(), streaming = false)
        .collect().map(key).toMap
      // both sealed windows emitted, sketch merged across triggers, and
      // the streamed estimates are bit-identical to the batch sketch
      assert(streamed === batch)
      assert(streamed.size === 2)
      assert(streamed(("v", "1970-01-01 00:00:10")) === 30L) // < k: exact
    } finally q.stop()
  }

  test("q51 tracks the exact per-day UV within KMV tolerance") {
    val approx = graft.operators.RefQueries.uvPerDayApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.operators.RefQueries.uvPerDay(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (dy, ex) =>
      val est = approx(dy)
      if (ex < 64) assert(est === ex, s"day $dy: below-k must be exact")
      else assert(math.abs(est - ex.toDouble) / ex < 0.5,
        s"day $dy: est $est vs exact $ex out of tolerance")
    }
  }
}
