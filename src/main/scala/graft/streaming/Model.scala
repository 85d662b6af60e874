package graft.streaming

import java.sql.Timestamp

/** Typed stream models mirroring the reference's JSON log / CDC shapes
  * (FIXTURES.md §A; gmall-realtime BaseLogAPP.java:64-179,
  * BaseDBApp.java:63-72). Case classes give Dataset encoders for the
  * stateful operators; the untyped from_json edge lives in LogPipeline.
  */
object Model {

  /** Flattened page-log event (reference `page` log after parse). Carries
    * the reference's full VisitorStats dimension key — vc (app version),
    * ch (channel), ar (area) — alongside is_new
    * (VisitorStatsApp.java:156-166); defaults keep fixture construction
    * terse where the dimensions don't matter. */
  case class LogEvent(
      mid: String,
      pageId: String,
      lastPageId: String, // null/"" = session entry
      isNew: String,      // "1" | "0"
      ts: Timestamp,
      vc: String = "",
      ch: String = "",
      ar: String = "")

  /** A repaired event (T1 output: is_new possibly rewritten). */
  case class RepairedEvent(
      mid: String,
      pageId: String,
      lastPageId: String,
      isNew: String,
      ts: Timestamp,
      repaired: Boolean,
      vc: String = "",
      ch: String = "",
      ar: String = "")

  /** Jump-out detection output (T2): the entry event that was never
    * followed within the window. Carries the visitor's full stats key
    * (vc, ch, ar, is_new) so downstream visitor stats attribute the jump
    * to the right bucket. */
  case class Jump(mid: String, pageId: String, isNew: String, ts: Timestamp,
                  vc: String = "", ch: String = "", ar: String = "")

  /** Order / order-detail shapes for the interval joins (J1/J2),
    * reference bean/OrderInfo.java, bean/OrderDetail.java (reduced to the
    * join-relevant columns). */
  case class OrderInfo(orderId: Long, userId: Long, totalAmount: Double,
                       createTime: Timestamp, provinceId: Long = 0L)
  case class OrderDetail(detailId: Long, orderId: Long, skuId: Long,
                         splitAmount: Double, createTime: Timestamp)
  case class PaymentInfo(paymentId: Long, orderId: Long, amount: Double,
                         callbackTime: Timestamp)
}
