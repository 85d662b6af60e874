package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import Model._

/** The reference's keyed-state operators, re-expressed on
  * `flatMapGroupsWithState` (SURVEY.md §2.9). These are the three pieces
  * Spark has no declarative primitive for; everything else in the engine is
  * DataFrame-native.
  *
  * Scale design: state is O(1) per key (a date string / one pending event),
  * evicted by event-time timeout as the watermark advances — the analogue of
  * the reference's 1-day state TTL (UniqueVisitApp.java:85-89). Keys
  * partition across executors by hash, exactly like Flink's keyBy.
  *
  * Known bound (VERDICT r2): each operator sorts its per-key, per-trigger
  * iterator (`it.toSeq.sortBy`) to restore event-time order — memory is
  * O(events per mid per trigger), fine for page-view keys (a device emits
  * a handful of events per trigger) but a pathological hot key would
  * buffer its whole trigger. The hot-key-safe forms live in
  * [[StatefulOpsV2]]: transformWithState with per-timestamp MapState and
  * event-time timers, where the timer queue itself restores order and
  * per-drain memory is bounded by one millisecond's events. These FMGWS
  * versions remain the batch-capable implementations (timers never fire
  * in batch queries).
  */
object StatefulOps {

  // shared immutable formatter: the per-event path must not allocate
  private val dayFmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
    .withZone(java.time.ZoneOffset.UTC)
  private[streaming] def dayOf(ts: Timestamp): String = dayFmt.format(ts.toInstant)
  private def day(ts: Timestamp): String = dayOf(ts)

  /** T1 — new/old-visitor repair (BaseLogAPP.java:74-130): keyed by mid,
    * state = first-visit day. An `is_new=1` event on a later day than the
    * recorded first visit is rewritten to `is_new=0`. State is evicted 30
    * idle days after a mid's last event (bounds state at scale; a client
    * returning after >30 idle days claiming is_new=1 escapes repair — the
    * accepted trade of any TTL'd dedup state, cf. UniqueVisitApp's 1-day
    * TTL in the reference). Streaming callers MUST watermark `ts`
    * (EventTimeTimeout requires it); batch mode needs none. */
  def visitorRepair(events: Dataset[LogEvent]): Dataset[RepairedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.mid).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (mid: String, it: Iterator[LogEvent], state: GroupState[String]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty[RepairedEvent] }
        else visitorRepairGroup(it, state)
    }
  }

  private def visitorRepairGroup(it: Iterator[LogEvent],
                                 state: GroupState[String]): Iterator[RepairedEvent] = {
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        val out = scala.collection.mutable.ArrayBuffer.empty[RepairedEvent]
        var firstDay = state.getOption.orNull
        sorted.foreach { e =>
          val d = day(e.ts)
          if (e.isNew == "1") {
            if (firstDay == null) {
              firstDay = d
              out += RepairedEvent(e.mid, e.pageId, e.lastPageId, "1", e.ts, repaired = false, e.vc, e.ch, e.ar)
            } else if (firstDay != d) {
              out += RepairedEvent(e.mid, e.pageId, e.lastPageId, "0", e.ts, repaired = true, e.vc, e.ch, e.ar)
            } else {
              out += RepairedEvent(e.mid, e.pageId, e.lastPageId, "1", e.ts, repaired = false, e.vc, e.ch, e.ar)
            }
          } else {
            out += RepairedEvent(e.mid, e.pageId, e.lastPageId, e.isNew, e.ts, repaired = false, e.vc, e.ch, e.ar)
          }
        }
        if (firstDay != null) {
          state.update(firstDay)
          // 30-day idle TTL; timeout fires only in streaming (batch has
          // no watermark), where the input carries one
          if (sorted.nonEmpty)
            try state.setTimeoutTimestamp(sorted.map(_.ts.getTime).max, "30 days")
            catch { case _: UnsupportedOperationException => () } // batch mode
        }
        out.iterator
  }

  /** F2 — UV / first-visit-per-day dedup (UniqueVisitApp.java:69-124):
    * keyed by mid, state = last emitted day; only a mid's first session
    * entry of each day passes. Events with a last_page_id are dropped (they
    * are mid-session, UniqueVisitApp.java:74-78). State expires via
    * event-time timeout one day after the last emit (the reference's
    * 1-day TTL). Requires a watermark on `ts` in streaming mode. */
  def uniqueVisit(events: Dataset[LogEvent]): Dataset[LogEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.mid).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (mid: String, it: Iterator[LogEvent], state: GroupState[String]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val sorted = it.toSeq
            .filter(e => e.lastPageId == null || e.lastPageId.isEmpty)
            .sortBy(_.ts.getTime)
          var lastDay = state.getOption.orNull
          val out = sorted.flatMap { e =>
            val d = day(e.ts)
            if (d != lastDay) { lastDay = d; Some(e) } else None
          }
          if (lastDay != null) {
            state.update(lastDay)
            if (out.nonEmpty)
              state.setTimeoutTimestamp(out.map(_.ts.getTime).max, "1 day")
          }
          out.iterator
        }
    }
  }

  /** Streaming exact dedup by event id within a watermark horizon
    * (training-pipeline streaming twin of exact dedup; the engine keeps
    * one state row per id and drops it when the watermark passes — bounded
    * state, unlike an unbounded dropDuplicates). */
  def streamingDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
                     tsCol: String, delay: String): org.apache.spark.sql.DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(idCol)

  /** T2 — CEP jump-out detection (UserJumpApp.java:88-158): keyed by mid,
    * event-time. A session-entry event (empty last_page_id) that is NOT
    * followed by any page event within `gapMs` is a "jump" — the timeout
    * match IS the output, via EventTimeTimeout against the watermark.
    * A follow-up that is itself an entry closes the old pattern and opens
    * a new one (the reference's pattern allows `first` to re-match).
    *
    * `emitTrailing`: batch queries never fire timeouts, so a pending entry
    * at end-of-data would be silently dropped — pass true in batch mode
    * (data is complete, so "no follow-up in the data" IS the timeout). */
  def userJump(events: Dataset[LogEvent], gapMs: Long = 10000L,
               emitTrailing: Boolean = false): Dataset[Jump] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.mid).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (mid: String, it: Iterator[LogEvent], state: GroupState[Jump]) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Jump]
        if (state.hasTimedOut) {
          // watermark passed pending entry + gap with no follow-up: a jump
          state.getOption.foreach(out += _)
          state.remove()
        } else {
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var pending = state.getOption.orNull
          sorted.foreach { e =>
            val isEntry = e.lastPageId == null || e.lastPageId.isEmpty
            if (pending != null) {
              if (e.ts.getTime - pending.ts.getTime > gapMs) {
                out += pending // nothing followed within gap: jump
                pending = null
              } else {
                pending = null // followed in time: pattern matched, discard
              }
            }
            if (isEntry && pending == null) pending = Jump(e.mid, e.pageId, e.isNew, e.ts, e.vc, e.ch, e.ar)
          }
          if (pending != null) {
            if (emitTrailing) out += pending
            else {
              state.update(pending)
              state.setTimeoutTimestamp(pending.ts.getTime + gapMs)
            }
          } else if (state.exists) state.remove()
        }
        out.iterator
    }
  }
}
