package graft.streaming

import graft.SparkSpec
import graft.streaming.Model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The canonical CEP fixture on the transformWithState implementation —
  * must match the flatMapGroupsWithState one exactly. */
class StatefulOpsV2Spec extends SparkSpec {

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
