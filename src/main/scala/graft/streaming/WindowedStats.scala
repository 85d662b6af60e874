package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A1–A5 — tumbling event-time window aggregations (the reference's only
  * window shape: 10 s tumble — ProductStatsApp.java:271,
  * VisitorStatsApp.java:169, ProvinceStatsSqlApp.java:60).
  *
  * One builder serves batch (oracle-checked) and streaming (append mode:
  * each window emits once when the watermark passes its end — the Flink
  * single-fire tumble semantics). Window bounds are stamped as
  * stt/edt strings exactly like A3 (ProductStatsApp.java:300-312).
  *
  * Streaming COUNT(DISTINCT) is expressed as size(collect_set()) — exact,
  * the declared choice in SURVEY.md §2.8/A4; at 100 TB swap for
  * approx_count_distinct per column where tolerance allows.
  */
object WindowedStats {

  def tumble(df: DataFrame, tsCol: String, keys: Seq[String],
             aggs: Seq[Column], windowDur: String = "10 seconds",
             watermarkDelay: String = "3 seconds", streaming: Boolean = false): DataFrame = {
    val base = if (streaming) df.withWatermark(tsCol, watermarkDelay) else df
    base.groupBy(window(col(tsCol), windowDur) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stt", date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("edt", date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss"))
      .drop("window")
  }

  /** A2-shaped visitor stats: pv/uv/duration per (vc, ch, ar, is_new)
    * per window (VisitorStatsApp.java:155-182). */
  def visitorStats(pages: DataFrame, windowDur: String = "10 seconds",
                   streaming: Boolean = false): DataFrame =
    tumble(
      pages.select(col("common.vc").as("vc"), col("common.ch").as("ch"),
        col("common.ar").as("ar"), col("common.is_new").as("is_new"),
        col("common.mid").as("mid"), col("page.during_time").as("during_time"),
        col("event_ts")),
      "event_ts", Seq("vc", "ch", "ar", "is_new"),
      Seq(count(lit(1)).as("pv_ct"),
        size(collect_set(col("mid"))).as("uv_ct"),
        sum(col("during_time")).as("dur_sum")),
      windowDur, streaming = streaming)

  /** U2/A2 — the reference VisitorStatsApp's 4-way union
    * (VisitorStatsApp.java:140-141): page views, unique visits, session
    * entries, and jump-outs each seed one metric of a unified schema, are
    * unioned, and window-reduced keyed by the reference's FULL 4-part
    * dimension key (vc, ch, ar, is_new) — VisitorStatsApp.java:156-166.
    * Inputs: the parsed page frame (pv + sv + duration), the UniqueVisit
    * output (uv), and the UserJump output (uj); the typed DWM shapes carry
    * vc/ch/ar through Model.LogEvent / Model.Jump. */
  def visitorStatsUnion(pages: DataFrame, uvEvents: DataFrame, jumps: DataFrame,
                        windowDur: String = "10 seconds",
                        streaming: Boolean = false): DataFrame = {
    val zero = lit(0L)
    val pvSeed = pages.select(
      col("common.vc").as("vc"), col("common.ch").as("ch"),
      col("common.ar").as("ar"), col("common.is_new").as("is_new"),
      col("event_ts"),
      lit(1L).as("pv_ct"), zero.as("uv_ct"),
      when(col("page.last_page_id").isNull || length(col("page.last_page_id")) === 0, 1L)
        .otherwise(0L).as("sv_ct"),
      zero.as("uj_ct"),
      coalesce(col("page.during_time"), lit(0L)).as("dur_sum"))
    val uvSeed = uvEvents.select(
      col("vc"), col("ch"), col("ar"), col("isNew").as("is_new"),
      col("ts").as("event_ts"),
      zero.as("pv_ct"), lit(1L).as("uv_ct"), zero.as("sv_ct"), zero.as("uj_ct"),
      zero.as("dur_sum"))
    val ujSeed = jumps.select(
      col("vc"), col("ch"), col("ar"), col("isNew").as("is_new"),
      col("ts").as("event_ts"),
      zero.as("pv_ct"), zero.as("uv_ct"), zero.as("sv_ct"), lit(1L).as("uj_ct"),
      zero.as("dur_sum"))
    val unioned = pvSeed.unionByName(uvSeed).unionByName(ujSeed)
    tumble(unioned, "event_ts", Seq("vc", "ch", "ar", "is_new"),
      Seq(sum(col("pv_ct")).as("pv_ct"), sum(col("uv_ct")).as("uv_ct"),
        sum(col("sv_ct")).as("sv_ct"), sum(col("uj_ct")).as("uj_ct"),
        sum(col("dur_sum")).as("dur_sum")),
      windowDur, streaming = streaming)
  }

  /** A4-shaped province stats: exact distinct orders + amount per key per
    * window (ProvinceStatsSqlApp.java:53-61). */
  def provinceStats(orderWide: DataFrame, windowDur: String = "10 seconds",
                    streaming: Boolean = false): DataFrame =
    tumble(orderWide, "o_time", Seq("provinceId"),
      Seq(size(collect_set(col("orderId"))).as("order_count"),
        sum(col("splitAmount").cast("decimal(18,2)")).cast("double").as("order_amount")),
      windowDur, streaming = streaming)
}
