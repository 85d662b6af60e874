package graft.apps

import graft.SparkSpec
import graft.sources.Kafka
import graft.streaming.VersionedState
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** VERDICT r11 #2: the reference's deployment shape as SEPARATE
  * concurrent streaming queries handing off through K2-EO ledger dirs
  * (the topic analogue), on real sf0.001 data:
  *
  *   ODS → [odsToDwd] → dwd ledger → [dwdOrdersToDwm] → dwm ledger →
  *   [dwmToGmvState] → GMV state;  dwd ledger → [dwdLogsToKeywordState]
  *   → keyword state;  states → publishDws → Serve.
  *
  * Gates: the mid-chain consumer is KILLED between feeds and restarted
  * from its checkpoint; a replayed (already-committed) produce changes
  * nothing; the final GMV equals batch q09 day-for-day (and through
  * Serve.gmv for sampled days), the keyword panel equals batch q10
  * (full counts and the served top-10). */
class LayeredPipelineSpec extends SparkSpec {

  test("ODS→DWD→DWM→DWS→Serve over the ledger; mid-chain restart; replay no-op") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val stage =
      java.nio.file.Files.createTempDirectory("graft-layered").toString
    val dwdLedger = s"$stage/ledger_dwd"; val dwmLedger = s"$stage/ledger_dwm"
    val gmvSt = s"$stage/state_gmv"; val kwSt = s"$stage/state_kw"
    val wh = s"$stage/wh"; val dimDir = s"$stage/dim_customer"
    graft.Tables.load(s, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).write.parquet(dimDir)

    // real sf0.001 rows as the ODS stream: a 1995-and-earlier order slice
    // (bounds the DWS day-partition fan-out) + the full documents table,
    // both tagged with their CDC table name
    val cutoff = "1996-01-01"
    val orderLines = graft.Tables.load(s, sf, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit(cutoff)))
      .select(lit("order_info").as("tbl"), col("o_orderkey"),
        col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .toJSON.collect()
    val docLines = graft.Tables.load(s, sf, "documents")
      .select(lit("page_log").as("tbl"), col("doc_id"), col("text"))
      .toJSON.collect()
    assert(orderLines.length > 100 && docLines.length > 100)
    // four feeds, each carrying both row kinds
    def chunk(lines: Array[String], i: Int): Seq[String] =
      lines.zipWithIndex.collect { case (l, j) if j % 4 == i => l }.toSeq
    def feed(i: Int): Seq[String] = chunk(orderLines, i) ++ chunk(docLines, i)

    val input = MemoryStream[String]
    val q1 = LayeredPipeline.odsToDwd(input.toDF().toDF("value"),
      dwdLedger, s"$stage/ck1")
    input.addData(feed(0): _*)
    q1.processAllAvailable() // dwd v=0 committed: both topic dirs exist
    var q2 = LayeredPipeline.dwdOrdersToDwm(s, dwdLedger, dimDir,
      dwmLedger, s"$stage/ck2")
    val q4 = LayeredPipeline.dwdLogsToKeywordState(s, dwdLedger, kwSt,
      s"$stage/ck4")
    q2.processAllAvailable() // dwm v=0 committed before its consumer starts
    val q3 = LayeredPipeline.dwmToGmvState(s, dwmLedger, gmvSt,
      s"$stage/ck3")
    q3.processAllAvailable(); q4.processAllAvailable()

    input.addData(feed(1): _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    q3.processAllAvailable(); q4.processAllAvailable()

    // mid-chain kill: the DWD→DWM hop dies; upstream and the keyword
    // branch keep flowing through the ledger while it is down
    q2.stop()
    input.addData(feed(2): _*)
    q1.processAllAvailable(); q4.processAllAvailable()
    // restart from the same checkpoint; it must drain the backlog
    q2 = LayeredPipeline.dwdOrdersToDwm(s, dwdLedger, dimDir,
      dwmLedger, s"$stage/ck2")
    q2.processAllAvailable(); q3.processAllAvailable()

    input.addData(feed(3): _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    q3.processAllAvailable(); q4.processAllAvailable()
    q1.stop(); q2.stop(); q3.stop(); q4.stop()

    // ---- replay changes nothing: an already-committed segment id is
    // skipped by the ledger at BOTH hops, so consumers restarted after
    // the replay see no new files and the states keep their versions
    val gmvV = VersionedState.latestVersion(s, gmvSt)
    val kwV = VersionedState.latestVersion(s, kwSt)
    assert(!Kafka.txnProduce(
      Seq(("dwd_order_info", """{"tbl":"order_info"}"""))
        .toDF("topic", "value"), dwdLedger, 0L))
    assert(!Kafka.txnProduce(
      Seq(("dwm_order_wide", """{"day":"1995-01-01"}"""))
        .toDF("topic", "value"), dwmLedger, 0L))
    val q2r = LayeredPipeline.dwdOrdersToDwm(s, dwdLedger, dimDir,
      dwmLedger, s"$stage/ck2")
    val q3r = LayeredPipeline.dwmToGmvState(s, dwmLedger, gmvSt,
      s"$stage/ck3")
    val q4r = LayeredPipeline.dwdLogsToKeywordState(s, dwdLedger, kwSt,
      s"$stage/ck4")
    q2r.processAllAvailable(); q3r.processAllAvailable()
    q4r.processAllAvailable()
    q2r.stop(); q3r.stop(); q4r.stop()
    assert(VersionedState.latestVersion(s, gmvSt) === gmvV)
    assert(VersionedState.latestVersion(s, kwSt) === kwV)

    // ---- batch truths: q09 (restricted to the streamed slice) and q10
    val batchGmv = graft.operators.RefQueries.gmvPerDay(s, sf)
      .filter(col("day") < cutoff).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val chainGmv = VersionedState.read(s, gmvSt,
        fail("gmv state must exist")).collect()
      .map(r => r.getString(0) ->
        ((r.getDecimal(1).doubleValue(), r.getLong(2)))).toMap
    assert(chainGmv === batchGmv)
    val batchKw = graft.operators.RefQueries.keywordCount(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val chainKw = VersionedState.read(s, kwSt,
        fail("keyword state must exist"))
      .orderBy(col("keyword")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(chainKw.toSeq === batchKw.toSeq)

    // ---- the serving layer answers from the published DWS tables
    LayeredPipeline.publishDws(s, gmvSt, kwSt, wh)
    val serve = Serve(s, wh)
    batchGmv.toSeq.sortBy(_._1).take(3).foreach { case (day, (g, _)) =>
      assert(serve.gmv(day.replace("-", "").toInt).doubleValue() === g)
    }
    val expectedTop = batchKw.sortBy { case (k, c) => (-c, k) }.take(10)
    val servedTop = serve.keywordTop(20210227, 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(servedTop.toSeq === expectedTop.toSeq)
  }
}
