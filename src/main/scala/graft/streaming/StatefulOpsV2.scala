package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ExpiredTimerInfo}
import Model._

/** T2 on Spark 4's `transformWithState` API — the successor of
  * flatMapGroupsWithState, with first-class named state and event-time
  * timers (and the RocksDB state store backing it). Same semantics as
  * [[StatefulOps.userJump]]; this is the forward-looking implementation,
  * the FMGWS one is the broadly-compatible one.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider` on the session running it.
  */
object StatefulOpsV2 {

  class JumpProcessor(gapMs: Long) extends StatefulProcessor[String, LogEvent, Jump] {
    @transient private var pending: org.apache.spark.sql.streaming.ValueState[Jump] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getValueState[Jump]("pending", Encoders.product[Jump], TTLConfig.NONE)

    override def handleInputRows(mid: String, rows: Iterator[LogEvent],
                                 tv: TimerValues): Iterator[Jump] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Jump]
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      val old: Jump = if (pending.exists) pending.get() else null
      var p: Jump = old
      sorted.foreach { e =>
        val isEntry = e.lastPageId == null || e.lastPageId.isEmpty
        if (p != null) {
          if (e.ts.getTime - p.ts.getTime > gapMs) out += p
          p = null
        }
        if (isEntry && p == null) p = Jump(e.mid, e.pageId, e.isNew, e.ts, e.vc, e.ch, e.ar)
      }
      if (old != null && (p == null || p.ts != old.ts))
        getHandle.deleteTimer(old.ts.getTime + gapMs)
      if (p != null) {
        pending.update(p)
        if (old == null || p.ts != old.ts)
          getHandle.registerTimer(p.ts.getTime + gapMs)
      } else pending.clear()
      out.iterator
    }

    override def handleExpiredTimer(mid: String, tv: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Jump] = {
      // watermark passed pending + gap with no follow-up: emit as jump
      val out = if (pending.exists) Iterator.single(pending.get()) else Iterator.empty
      pending.clear()
      out
    }
  }

  def userJump(events: Dataset[LogEvent], gapMs: Long = 10000L): Dataset[Jump] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.mid)
      .transformWithState(new JumpProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
