package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.Kafka
import graft.streaming.VersionedState

/** The reference's DEPLOYMENT shape, not just its operators: N
  * independent jobs handing off through Kafka topics —
  * `BaseLogAPP.java:196-198` produces dwd topics, `UniqueVisitApp.java:61`
  * and OrderWideApp consume them into dwm topics, the DWS apps aggregate
  * those, and `SugarController.java:52-66` serves the result. Every layer
  * here is a SEPARATE long-running streaming query; the topic analogue is
  * the K2-EO transactional ledger ([[Kafka.txnProduce]] /
  * [[Kafka.readCommitted]]) so each hop inherits the exactly-once produce
  * contract the reference gets from transactional Kafka producers
  * (MyKafkaUtil.java:38-45).
  *
  * Hop topology (LayeredPipelineSpec drives it end-to-end on sf0.001 data
  * with a mid-chain kill/restart and a replayed segment):
  *
  *   ODS (one raw CDC/log stream, `tbl`-tagged JSON)
  *     ─[odsToDwd: route by tbl]→ dwdLedger topic=dwd_order_info
  *                               ↘ dwdLedger topic=dwd_page_log
  *   dwd_order_info ─[dwdOrdersToDwm: broadcast dim enrich]→
  *     dwmLedger topic=dwm_order_wide
  *   dwm_order_wide ─[dwmToGmvState: versioned day-grain reduce]→ GMV state
  *   dwd_page_log   ─[dwdLogsToKeywordState: tokenize+count]→ keyword state
  *   states ─[publishDws]→ warehouse DWS tables → [[Serve]]
  *
  * Consumers read the ledger through Spark's file stream source over the
  * committed segment layout (a `v=N` glob pinned to one `topic=<t>`
  * partition dir): new segments appear
  * exactly when their producer's parquet job commits, so segment
  * visibility matches [[Kafka.readCommitted]]'s rule under the crash
  * windows the spec exercises; a replayed producer batch is skipped by
  * the ledger before any file lands, so downstream sources never see a
  * duplicate. State merges are [[VersionedState]] transactions — the
  * replay-safe upsert every foreachBatch merge in this repo rides.
  */
object LayeredPipeline {

  /** ODS JSON carries its CDC table tag; DWD topic is a pure routing
    * projection of it (BaseDBApp's TableProcess routing, X2, collapsed to
    * the three tables this chain consumes). */
  def odsToDwd(ods: DataFrame, dwdLedger: String,
               checkpoint: String): StreamingQuery =
    Kafka.exactlyOnceDynamicTopicSink(
      ods.select(
        when(get_json_object(col("value"), "$.tbl") === "order_info",
          lit("dwd_order_info"))
        .when(get_json_object(col("value"), "$.tbl") === "visit_log",
          lit("dwd_visit_log"))
        .otherwise(lit("dwd_page_log")).as("topic"),
        col("value")),
      dwdLedger, checkpoint).start()

  /** Streaming consumer over one topic of a ledger: Spark's file stream
    * source on the committed segment dirs (schema is the K2 value
    * column; `topic` is the partition dir the glob pins). Sets the
    * per-source `ignoreMissingFiles` (FileSourceOptions) because a
    * ledger may be under retention ([[Kafka.expireSegments]]): a
    * segment path captured by the per-trigger glob just before the
    * expiry rename is a clean whole-dir stat miss the consumer must
    * skip, not die on — retention's contract already guarantees the
    * horizon exceeds consumer lag, so a skipped path is always an
    * already-consumed segment, never data loss. */
  def topicStream(s: SparkSession, ledger: String, topic: String): DataFrame =
    s.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("value STRING"))
      .option("ignoreMissingFiles", "true")
      .parquet(s"$ledger/v=*/topic=$topic")

  /** DWD→DWM: the OrderWideApp hop — parse the order fact, enrich with a
    * per-batch broadcast dim snapshot (J3's lookup-join shape), stamp the
    * event day, produce exactly-once to the DWM ledger. */
  def dwdOrdersToDwm(s: SparkSession, dwdLedger: String, dimDir: String,
                     dwmLedger: String, checkpoint: String): StreamingQuery = {
    val orders = topicStream(s, dwdLedger, "dwd_order_info")
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType
        .fromDDL("o_orderkey BIGINT, o_custkey BIGINT, " +
          "o_orderdate TIMESTAMP, o_totalprice DECIMAL(18,2)")).as("o"))
      .select(col("o.*"))
    orders.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      // dim snapshot read per micro-batch (S5's config-poll discipline);
      // broadcast: the dim is customer-dimension-sized, never the fact
      val dim = s.read.parquet(dimDir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      val wide = b.join(broadcast(dim), Seq("o_custkey"), "left")
        .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          col("o_orderkey"), col("o_totalprice"), col("c_mktsegment"))
      Kafka.txnProduce(
        Kafka.toJsonValue(wide).select(lit("dwm_order_wide").as("topic"),
          col("value")),
        dwmLedger, id)
      (): Unit
    }.option("checkpointLocation", checkpoint).start()
  }

  private val visitDdl = "mid STRING, pageId STRING, lastPageId STRING, " +
    "isNew STRING, ts TIMESTAMP, vc STRING, ch STRING, ar STRING"

  /** Typed visit-log stream off the DWD ledger: parse + 0-delay
    * watermark. Sentinel rows (they exist only to push the watermark
    * past real data — the MemoryStream/file-source analogue of a live
    * stream's continuous arrivals) are NOT dropped here: a `mid`
    * predicate doesn't reference the watermark column, so Catalyst's
    * PushPredicateThroughNonJoin would move it BELOW the
    * EventTimeWatermark node and the sentinel would stop advancing the
    * watermark (observed: the final event's drain timer never fired).
    * Each producer filters the sentinel from its OUTPUT instead. */
  private def visitStream(s: SparkSession, dwdLedger: String) = {
    import s.implicits._
    topicStream(s, dwdLedger, "dwd_visit_log")
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType
        .fromDDL(visitDdl)).as("r"))
      .select(col("r.*"))
      .withWatermark("ts", "0 seconds")
      .as[graft.streaming.Model.LogEvent]
  }

  /** DWD→DWM (the state-heavy DWM hop, VERDICT r12 #3): UniqueVisitApp
    * (`UniqueVisitApp.java:69-124`) as a ledger consumer — F2's
    * first-visit-per-day keyed dedup (transformWithState, RocksDB) over
    * the visit log, surviving events produced exactly-once to
    * `dwm_unique_visit`. */
  def dwdVisitsToUv(s: SparkSession, dwdLedger: String, dwmLedger: String,
                    checkpoint: String,
                    wmSentinel: String = "__wm__"): StreamingQuery = {
    val uv = graft.streaming.StatefulOpsV2
      .uniqueVisit(visitStream(s, dwdLedger))
      .toDF().filter(col("mid") =!= wmSentinel)
    Kafka.exactlyOnceDynamicTopicSink(
      Kafka.toJsonValue(uv)
        .select(lit("dwm_unique_visit").as("topic"), col("value")),
      dwmLedger, checkpoint).start()
  }

  /** DWD→DWM: UserJumpApp (`UserJumpApp.java:88-158`) as a ledger
    * consumer — T2's CEP timeout detection (event-time timers) over the
    * visit log; detected jump-outs produced exactly-once to
    * `dwm_user_jump`. `gapMs` defaults to the batch q07 twin's 600 s. */
  def dwdVisitsToJump(s: SparkSession, dwdLedger: String, dwmLedger: String,
                      checkpoint: String, gapMs: Long = 600000L,
                      wmSentinel: String = "__wm__"): StreamingQuery = {
    val jumps = graft.streaming.StatefulOpsV2
      .userJump(visitStream(s, dwdLedger), gapMs)
      .toDF().filter(col("mid") =!= wmSentinel)
    Kafka.exactlyOnceDynamicTopicSink(
      Kafka.toJsonValue(jumps)
        .select(lit("dwm_user_jump").as("topic"), col("value")),
      dwmLedger, checkpoint).start()
  }

  private def emptyVisitor(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "day STRING, uv_ct BIGINT, uj_ct BIGINT"))

  /** DWM→DWS: the VisitorStats-shaped reduce — the U2 union of the two
    * DWM visit topics folded into one day-grain (uv_ct, uj_ct) state
    * (VisitorStatsApp.java's keyed reduce at the grain the publisher
    * serves). One streaming query, two ledger sources, one
    * [[VersionedState]] transaction per micro-batch. The two producers
    * write SEPARATE ledger dirs — the ledger's `v=<batchId>` commit
    * protocol is single-writer per dir (two producers would collide on
    * version ids), exactly as a Kafka topic has one transactional
    * producer per partition in the reference. */
  def dwmVisitsToVisitorState(s: SparkSession, uvLedger: String,
                              jumpLedger: String, stateDir: String,
                              checkpoint: String): StreamingQuery = {
    def dayRows(ledger: String, topic: String, uv: Int, uj: Int) =
      topicStream(s, ledger, topic)
        .select(from_json(col("value"), org.apache.spark.sql.types.StructType
          .fromDDL("mid STRING, ts TIMESTAMP")).as("r"))
        .select(date_format(col("r.ts"), "yyyy-MM-dd").as("day"),
          lit(uv.toLong).as("uv_ct"), lit(uj.toLong).as("uj_ct"))
    dayRows(uvLedger, "dwm_unique_visit", 1, 0)
      .unionByName(dayRows(jumpLedger, "dwm_user_jump", 0, 1))
      .writeStream.foreachBatch { (b: DataFrame, id: Long) =>
        VersionedState.applyBatch(s, stateDir, id, b, emptyVisitor(s),
          (st, bt) => st.unionByName(
              bt.groupBy(col("day")).agg(sum(col("uv_ct")).as("uv_ct"),
                sum(col("uj_ct")).as("uj_ct")))
            .groupBy(col("day")).agg(sum(col("uv_ct")).as("uv_ct"),
              sum(col("uj_ct")).as("uj_ct")))
        (): Unit
      }.option("checkpointLocation", checkpoint).start()
  }

  /** Materialize the visitor state as the dws_visitor_stats table
    * [[Serve]] registers (stt = day start, the publisher's grain). */
  def publishVisitorDws(s: SparkSession, visitorStateDir: String,
                        warehouseDir: String): Unit =
    graft.sinks.Warehouse.writeDws(
      VersionedState.read(s, visitorStateDir, emptyVisitor(s))
        .select(to_timestamp(col("day")).as("stt"), col("uv_ct"),
          col("uj_ct")),
      s"$warehouseDir/dws_visitor_stats")

  private def emptyGmv(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "day STRING, gmv DECIMAL(38,2), order_ct BIGINT"))

  /** DWM→DWS: day-grain GMV reduce as a [[VersionedState]] transaction —
    * the ProductStats windowed-aggregate hop at the grain the publisher
    * serves (toYYYYMMDD(stt)). Exact decimal sums; a replayed batchId is
    * a no-op by the state protocol. */
  def dwmToGmvState(s: SparkSession, dwmLedger: String, stateDir: String,
                    checkpoint: String): StreamingQuery =
    topicStream(s, dwmLedger, "dwm_order_wide")
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType
        .fromDDL("day STRING, o_totalprice DECIMAL(18,2)")).as("r"))
      .select(col("r.*"))
      .writeStream.foreachBatch { (b: DataFrame, id: Long) =>
        VersionedState.applyBatch(s, stateDir, id, b, emptyGmv(s),
          (st, bt) => st.unionByName(
              bt.groupBy(col("day")).agg(
                sum(col("o_totalprice")).cast("decimal(38,2)").as("gmv"),
                count(lit(1)).as("order_ct")))
            .groupBy(col("day")).agg(
              sum(col("gmv")).cast("decimal(38,2)").as("gmv"),
              sum(col("order_ct")).as("order_ct")))
        (): Unit
      }.option("checkpointLocation", checkpoint).start()

  private def emptyKw(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "keyword STRING, ct BIGINT"))

  /** DWD→DWS: the KeywordStatsApp hop — tokenize the page-log payload
    * (D1's UDTF as explode) and maintain exact counts per keyword. */
  def dwdLogsToKeywordState(s: SparkSession, dwdLedger: String,
                            stateDir: String,
                            checkpoint: String): StreamingQuery =
    topicStream(s, dwdLedger, "dwd_page_log")
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType
        .fromDDL("doc_id BIGINT, text STRING")).as("r"))
      .select(explode(graft.functions.Text.tokens(col("r.text")))
        .as("keyword"))
      .writeStream.foreachBatch { (b: DataFrame, id: Long) =>
        VersionedState.applyBatch(s, stateDir, id, b, emptyKw(s),
          (st, bt) => st.unionByName(
              bt.groupBy(col("keyword")).agg(count(lit(1)).as("ct")))
            .groupBy(col("keyword")).agg(sum(col("ct")).as("ct")))
        (): Unit
      }.option("checkpointLocation", checkpoint).start()

  /** Materialize the final committed states as the warehouse DWS tables
    * [[Serve]] registers — product stats at day grain (stt = day start,
    * order_amount = the day's GMV) and the keyword panel. `panelStt`
    * stamps keyword rows (the reference's window start). */
  def publishDws(s: SparkSession, gmvStateDir: String, kwStateDir: String,
                 warehouseDir: String,
                 panelStt: String = "2021-02-27 10:00:00"): Unit = {
    graft.sinks.Warehouse.writeDws(
      VersionedState.read(s, gmvStateDir, emptyGmv(s))
        .select(to_timestamp(col("day")).as("stt"), lit(0L).as("sku_id"),
          col("gmv").as("order_amount"), col("order_ct")),
      s"$warehouseDir/dws_product_stats")
    graft.sinks.Warehouse.writeDws(
      VersionedState.read(s, kwStateDir, emptyKw(s))
        .select(to_timestamp(lit(panelStt)).as("stt"), col("keyword"),
          col("ct"), lit("SEARCH").as("source")),
      s"$warehouseDir/dws_keyword_stats")
  }
}
