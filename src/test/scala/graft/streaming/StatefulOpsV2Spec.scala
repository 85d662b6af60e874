package graft.streaming

import graft.SparkSpec
import graft.streaming.Model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The canonical CEP fixture on the transformWithState implementation —
  * must match the flatMapGroupsWithState one exactly. */
class StatefulOpsV2Spec extends SparkSpec {

  private def withRocksDb[T](body: => T): T = {
    val s = spark
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("T1 visitorRepair on transformWithState: later-day repeat repaired") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val day1 = 1700000000000L
      val day2 = day1 + 86400000L
      val input = MemoryStream[LogEvent]
      input.addData(
        LogEvent("m1", "home", null, "1", ts(day1)),
        LogEvent("m1", "home", null, "1", ts(day2)), // lying "new": repair
        LogEvent("m2", "home", null, "0", ts(day2)))
      val out = StatefulOpsV2.visitorRepair(
        input.toDS().withWatermark("ts", "1 second"))
      val q = out.writeStream.format("memory").queryName("vr_v2")
        .outputMode(OutputMode.Append).start()
      try {
        q.processAllAvailable()
        input.addData(LogEvent("zz", "home", "x", "0", ts(day2 + 86400000L)))
        q.processAllAvailable()
        val got = s.table("vr_v2").as[RepairedEvent].collect()
          .filter(_.mid != "zz")
        val m1d2 = got.find(e => e.mid == "m1" && e.ts.getTime == day2).get
        assert(m1d2.isNew === "0" && m1d2.repaired)
        assert(got.find(e => e.mid == "m1" && e.ts.getTime == day1).get.isNew === "1")
        assert(got.find(_.mid == "m2").get.isNew === "0")
      } finally q.stop()
    }
  }

  test("T1 visitorRepair V2: out-of-order arrival within a batch drains in event-time order") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val day1 = 1700000000000L
      val day2 = day1 + 86400000L
      val input = MemoryStream[LogEvent]
      // day2 event arrives FIRST: a naive arrival-order fold would let it
      // claim first-visit and wrongly repair the day1 event; the timer
      // queue must drain day1 before day2
      input.addData(
        LogEvent("m1", "home", null, "1", ts(day2)),
        LogEvent("m1", "home", null, "1", ts(day1)))
      val out = StatefulOpsV2.visitorRepair(
        input.toDS().withWatermark("ts", "1 second"))
      val q = out.writeStream.format("memory").queryName("vr_v2_ooo")
        .outputMode(OutputMode.Append).start()
      try {
        q.processAllAvailable()
        input.addData(LogEvent("zz", "home", "x", "0", ts(day2 + 86400000L)))
        q.processAllAvailable()
        val got = s.table("vr_v2_ooo").as[RepairedEvent].collect()
          .filter(_.mid == "m1").sortBy(_.ts.getTime)
        assert(got.map(_.isNew).toSeq === Seq("1", "0"))
        assert(got.last.repaired)
      } finally q.stop()
    }
  }

  test("T1 V2: idle cleanup must not clear state while later events sit buffered") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val day1 = 1700000000000L
      val day = 86400000L
      val input = MemoryStream[LogEvent]
      val out = StatefulOpsV2.visitorRepair(
        input.toDS().withWatermark("ts", "1 second"))
      val q = out.writeStream.format("memory").queryName("vr_v2_ttl")
        .outputMode(OutputMode.Append).start()
      try {
        // day1 visit drains; the 30-day cleanup horizon lands at day31
        input.addData(LogEvent("m1", "home", null, "1", ts(day1)))
        input.addData(LogEvent("zz", "home", "x", "0", ts(day1 + 2 * day)))
        q.processAllAvailable()
        // a lying "new" visit on day40 is BUFFERED (watermark still low)
        input.addData(LogEvent("m1", "home", null, "1", ts(day1 + 40 * day)))
        q.processAllAvailable()
        // watermark jumps past BOTH the day31 cleanup and the day40 drain;
        // the cleanup fires first — it must see the buffered event and
        // keep firstDay, so day40 is repaired like the FMGWS twin would
        input.addData(LogEvent("zz", "home", "x", "0", ts(day1 + 80 * day)))
        q.processAllAvailable()
        val m1 = s.table("vr_v2_ttl").as[RepairedEvent].collect()
          .filter(_.mid == "m1").sortBy(_.ts.getTime)
        assert(m1.length === 2)
        assert(m1.last.isNew === "0" && m1.last.repaired,
          "idle cleanup wiped first-visit state despite a buffered event")
      } finally q.stop()
    }
  }

  test("F2 uniqueVisit on transformWithState: first entry per day passes") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val day1 = 1700000000000L
      val day2 = day1 + 86400000L
      val input = MemoryStream[LogEvent]
      input.addData(
        LogEvent("m1", "home", null, "1", ts(day1)),         // pass
        LogEvent("m1", "list", "", "1", ts(day1 + 1000)),    // same day: drop
        LogEvent("m1", "detail", "home", "1", ts(day1 + 2000)), // mid-session: drop
        LogEvent("m1", "home", null, "1", ts(day2)),         // pass
        LogEvent("m2", "home", "", "0", ts(day1)))           // pass
      val out = StatefulOpsV2.uniqueVisit(
        input.toDS().withWatermark("ts", "1 second"))
      val q = out.writeStream.format("memory").queryName("uv_v2")
        .outputMode(OutputMode.Append).start()
      try {
        q.processAllAvailable()
        input.addData(LogEvent("zz", "home", "x", "0", ts(day2 + 86400000L)))
        q.processAllAvailable()
        val got = s.table("uv_v2").as[LogEvent].collect().filter(_.mid != "zz")
        assert(got.length === 3)
        assert(got.count(_.mid == "m1") === 2)
      } finally q.stop()
    }
  }

  test("V2 ordered drain survives a large key group (hot-key shape)") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val day1 = 1700000000000L
      val day2 = day1 + 86400000L
      // one hot mid, 4000 session entries over two days, distinct
      // timestamps — the FMGWS form would buffer+sort all of them on the
      // heap per trigger; the V2 form drains per-timestamp
      val evs = (0 until 4000).map { i =>
        val base = if (i % 2 == 0) day1 else day2
        LogEvent("hot", "home", null, "1", ts(base + i * 7L))
      }
      val input = MemoryStream[LogEvent]
      input.addData(evs: _*)
      val out = StatefulOpsV2.uniqueVisit(
        input.toDS().withWatermark("ts", "1 second"))
      val q = out.writeStream.format("memory").queryName("uv_v2_hot")
        .outputMode(OutputMode.Append).start()
      try {
        q.processAllAvailable()
        input.addData(LogEvent("zz", "home", "x", "0", ts(day2 + 86400000L)))
        q.processAllAvailable()
        val got = s.table("uv_v2_hot").as[LogEvent].collect().filter(_.mid == "hot")
        // exactly the first entry of each of the two days
        assert(got.length === 2)
        assert(got.map(e => StatefulOps.dayOf(e.ts)).toSet.size === 2)
        assert(got.map(_.ts.getTime).toSet === Set(day1, day2 + 7L))
      } finally q.stop()
    }
  }

  test("V2 uniqueVisit chains into a windowed aggregation (DWM -> DWS)") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import org.apache.spark.sql.functions._
      val day1 = 1700000000000L
      val day2 = day1 + 86400000L
      val input = MemoryStream[LogEvent]
      input.addData(
        LogEvent("m1", "home", null, "1", ts(day1)),
        LogEvent("m1", "list", "", "1", ts(day1 + 1000)),  // same day: deduped
        LogEvent("m2", "home", "", "0", ts(day1 + 2000)),
        LogEvent("m1", "home", null, "1", ts(day2)))
      // the chained form declares its event-time column so the downstream
      // tumble re-derives a watermark — two stateful operators, one query
      val uv = StatefulOpsV2.uniqueVisit(
        input.toDS().withWatermark("ts", "1 second"), chainTs = Some("ts"))
      val daily = uv.groupBy(window(col("ts"), "1 day")).agg(count(lit(1)).as("uv_ct"))
      val q = daily.writeStream.format("memory").queryName("uv_chain")
        .outputMode(OutputMode.Append).start()
      try {
        q.processAllAvailable()
        input.addData(LogEvent("zz", "home", "x", "0", ts(day2 + 2 * 86400000L)))
        q.processAllAvailable()
        val rows = s.table("uv_chain").collect()
          .map(r => r.getStruct(0).getTimestamp(0).getTime -> r.getLong(1)).toMap
        val d1win = (day1 / 86400000L) * 86400000L
        val d2win = (day2 / 86400000L) * 86400000L
        assert(rows.get(d1win).contains(2L)) // m1 + m2 on day1 (dup dropped)
        assert(rows.get(d2win).contains(1L)) // m1 on day2
      } finally q.stop()
    }
  }

  test("T2 userJump on transformWithState: canonical fixture") {
    val s = spark
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val input = MemoryStream[LogEvent]
      input.addData(
        LogEvent("101", "home", null, "1", ts(10000L)),
        LogEvent("102", "home", null, "1", ts(12000L)),
        LogEvent("102", "good_list", "home", "1", ts(150000L)),
        LogEvent("102", "good_list", "detail", "1", ts(300000L)))
      val jumps = StatefulOpsV2.userJump(
        input.toDS().withWatermark("ts", "1 second"), gapMs = 10000L)
      val q = jumps.writeStream.format("memory").queryName("jumps_v2")
        .outputMode(OutputMode.Append).start()
      try {
        q.processAllAvailable()
        input.addData(LogEvent("999", "home", "x", "0", ts(400000L)))
        q.processAllAvailable()
        val got = s.table("jumps_v2").as[Jump].collect()
          .map(j => (j.mid, j.ts.getTime)).toSet
        assert(got === Set(("101", 10000L), ("102", 12000L)))
      } finally q.stop()
    } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
