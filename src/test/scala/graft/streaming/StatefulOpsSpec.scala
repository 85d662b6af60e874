package graft.streaming

import graft.SparkSpec
import graft.streaming.Model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulOpsSpec extends SparkSpec {

  test("T2 userJump: canonical 4-event CEP fixture (UserJumpApp.java:56-64)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[LogEvent]
    val jumps = StatefulOps.userJump(
      input.toDS().withWatermark("ts", "1 second"), gapMs = 10000L)
    val q = jumps.writeStream.format("memory").queryName("jumps")
      .outputMode(OutputMode.Append).start()
    try {
      // mid 101: entry never followed; mid 102: entry followed only at +138 s
      input.addData(
        LogEvent("101", "home", null, "1", ts(10000L)),
        LogEvent("102", "home", null, "1", ts(12000L)),
        LogEvent("102", "good_list", "home", "1", ts(150000L)),
        LogEvent("102", "good_list", "detail", "1", ts(300000L)))
      q.processAllAvailable()
      // sentinel advances the watermark so 101's timeout fires
      input.addData(LogEvent("999", "home", "x", "0", ts(400000L)))
      q.processAllAvailable()
      val got = s.table("jumps").as[Jump].collect()
        .map(j => (j.mid, j.ts.getTime)).toSet
      assert(got === Set(("101", 10000L), ("102", 12000L)))
    } finally q.stop()
  }

  test("T2 userJump: entry followed within gap is not a jump") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[LogEvent]
    val jumps = StatefulOps.userJump(
      input.toDS().withWatermark("ts", "1 second"), gapMs = 10000L)
    val q = jumps.writeStream.format("memory").queryName("jumps2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        LogEvent("7", "home", null, "1", ts(1000L)),
        LogEvent("7", "detail", "home", "1", ts(5000L)))
      q.processAllAvailable()
      input.addData(LogEvent("999", "home", "x", "0", ts(500000L)))
      q.processAllAvailable()
      assert(s.table("jumps2").count() === 0)
    } finally q.stop()
  }

  test("T1 visitorRepair: is_new rewritten on later-day repeat (batch mode)") {
    val s = spark
    import s.implicits._
    val day1 = 1700000000000L // 2023-11-14
    val day2 = day1 + 86400000L
    val events = Seq(
      LogEvent("m1", "home", null, "1", ts(day1)),
      LogEvent("m1", "home", null, "1", ts(day2)),      // lying "new": repair
      LogEvent("m2", "home", null, "0", ts(day2))).toDS()
    val out = StatefulOps.visitorRepair(events).collect()
    val m1d2 = out.find(e => e.mid == "m1" && e.ts.getTime == day2).get
    assert(m1d2.isNew === "0" && m1d2.repaired)
    assert(out.find(e => e.mid == "m1" && e.ts.getTime == day1).get.isNew === "1")
    assert(out.find(_.mid == "m2").get.isNew === "0")
  }

  test("F2 uniqueVisit: first entry per mid per day passes (batch mode)") {
    val s = spark
    import s.implicits._
    val day1 = 1700000000000L
    val day2 = day1 + 86400000L
    val events = Seq(
      LogEvent("m1", "home", null, "1", ts(day1)),        // pass (first of day1)
      LogEvent("m1", "list", "", "1", ts(day1 + 1000)),   // entry but same day: drop
      LogEvent("m1", "detail", "home", "1", ts(day1 + 2000)), // mid-session: drop
      LogEvent("m1", "home", null, "1", ts(day2)),        // pass (first of day2)
      LogEvent("m2", "home", "", "0", ts(day1))).toDS()   // pass
    val out = StatefulOps.uniqueVisit(events).collect()
    assert(out.length === 3)
    assert(out.count(_.mid == "m1") === 2)
  }
}
