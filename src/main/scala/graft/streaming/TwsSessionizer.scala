package graft.streaming

import graft.streaming.StatefulSessionizer.{emit, foldEvents, Event, OpenSession, SessionOut}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Gap sessionization on `transformWithState` — Spark 4's
  * arbitrary-state Processor API (typed `ValueState` + explicit
  * event-time timers on the RocksDB state store), the closest Spark
  * analog of the Kafka Streams Processor API with punctuators, and the
  * designated successor of `flatMapGroupsWithState`.
  *
  * Session SEMANTICS are shared with [[StatefulSessionizer]] through the
  * [[StatefulSessionizer.foldEvents]] fold, so the 3-way batch parity
  * property extends to a 4-way one (session_window ≡ lag+cumsum ≡ fmgws
  * ≡ transformWithState — pinned in StreamingSpec). What this operator
  * exercises beyond fmgws:
  *
  *   - explicit timer lifecycle: one event-time timer per open session,
  *     re-armed (delete + register) when a new event extends the
  *     session, instead of fmgws's single implicit timeout slot;
  *   - composable typed state: `getValueState` is one of N named state
  *     variables a processor may hold (list/map state compose the same
  *     way), each its own RocksDB column family;
  *   - state TTL plumbing (`TTLConfig`) — NONE here because session
  *     state must outlive arbitrary gaps and is deleted explicitly on
  *     emission, but the retention knob a production processor sets.
  *
  * Requires the RocksDB state-store provider (a `transformWithState`
  * constraint, not ours).
  */
object TwsSessionizer {

  /** Per-user processor: the open session in a `ValueState`, one timer
    * armed at `last_event + gap` (re-armed as events extend the session);
    * the timer firing = the watermark passed session end → emit + clear. */
  class GapSessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Event, SessionOut] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val before = if (open.exists()) Some(open.get()) else None
      val (closed, cur) = foldEvents(gapUs, key, before, rows)
      cur.foreach { s =>
        open.update(s)
        val newTimer = (s.lastUs + gapUs) / 1000
        val oldTimer = before.map(b => (b.lastUs + gapUs) / 1000)
        if (!oldTimer.contains(newTimer)) {
          oldTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(newTimer)
        }
      }
      closed.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      // A timer is authoritative only if it still matches the open
      // session's end — a stale timer (session extended after arming;
      // defensive, the re-arm above deletes them) must not emit early.
      if (open.exists()) {
        val s = open.get()
        if ((s.lastUs + gapUs) / 1000 <= expiredTimerInfo.getExpiryTimeInMs) {
          open.clear()
          Iterator.single(emit(key, s, gapUs))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** Streaming entry point (Append mode, event-time timers). */
  def sessionize(events: Dataset[Event], gapUs: Long = 30L * 60 * 1000000,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new GapSessionProcessor(gapUs),
        TimeMode.EventTime, OutputMode.Append)
  }
}
