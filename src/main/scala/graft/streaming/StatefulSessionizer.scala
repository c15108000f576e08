package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The one custom stateful operator (§2.8 `stateful_custom`): a
  * Processor-API analog of gap sessionization built directly on
  * `flatMapGroupsWithState` with explicit event-time timeouts — per-user
  * session state, sessions emitted either when a new event arrives beyond
  * the gap or when the watermark passes `last_event + gap` (timeout).
  *
  * Semantics are pinned to `session_window` / lag+cumsum by a three-way
  * property test: new session iff `ts - prev_ts > gap` (an event exactly
  * `gap` after the last still merges); session end is `last_ts + gap`.
  */
object StatefulSessionizer {

  case class Event(event_id: Long, user_id: Long, ts: Timestamp, value: Double)

  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sum: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  private[streaming] def us(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000

  private def toTs(usVal: Long): Timestamp = {
    val t = new Timestamp(usVal / 1000)
    t.setNanos(((usVal % 1000000) * 1000).toInt)
    t
  }

  private[streaming] def emit(userId: Long, s: OpenSession, gapUs: Long): SessionOut =
    SessionOut(userId, toTs(s.startUs), toTs(s.lastUs + gapUs), s.n, s.sum)

  /** The pure gap-merge fold — the single source of session semantics for
    * BOTH custom-state operators (`flatMapGroupsWithState` here and
    * [[TwsSessionizer]]'s `transformWithState` processor): fold the
    * batch's events (event-time order, id tiebreak) into the open
    * session, closing a session whenever the gap is exceeded. Returns
    * (closed sessions, the still-open tail). */
  private[streaming] def foldEvents(gapUs: Long, userId: Long,
      init: Option[OpenSession],
      events: Iterator[Event]): (Vector[SessionOut], Option[OpenSession]) = {
    val sorted = events.toIndexedSeq.sortBy(e => (us(e.ts), e.event_id))
    val closed = Vector.newBuilder[SessionOut]
    var cur = init
    sorted.foreach { e =>
      val tUs = us(e.ts)
      cur match {
        case Some(s) if tUs - s.lastUs <= gapUs =>
          cur = Some(OpenSession(s.startUs, math.max(s.lastUs, tUs), s.n + 1, s.sum + e.value))
        case Some(s) =>
          closed += emit(userId, s, gapUs)
          cur = Some(OpenSession(tUs, tUs, 1, e.value))
        case None =>
          cur = Some(OpenSession(tUs, tUs, 1, e.value))
      }
    }
    (closed.result(), cur)
  }

  /** [[foldEvents]] applied to a `GroupState` (the fmgws flavors): close
    * sessions broken by the gap, leave the tail open in `state`, and
    * return the closed ones. The caller decides how the open tail
    * eventually emits (event-time watermark vs wall-clock idle). */
  private def mergeEvents(gapUs: Long, userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val (closed, cur) = foldEvents(gapUs, userId, state.getOption, events)
    cur.foreach(state.update)
    closed.iterator
  }

  /** The per-group state transition (event-time timeouts). Public for
    * direct unit testing. */
  def updateGroup(gapUs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit(userId, _, gapUs)).iterator
      state.remove()
      out
    } else {
      val closed = mergeEvents(gapUs, userId, events, state)
      // Emit via timeout once the watermark passes session end.
      state.getOption.foreach(s => state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000))
      closed
    }
  }

  /** Wall-clock variant (KS WALL_CLOCK_TIME punctuate analog): an open
    * session also emits after `idleMs` of processing time with no new
    * events for the key — a stalled partition/source cannot hold its
    * last session open forever, which EventTimeTimeout (watermark-driven,
    * hence data-driven) cannot guarantee. A session emitted by idle
    * timeout still closes at `last_event + gap` in event time. */
  def updateGroupProcTime(gapUs: Long, idleMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit(userId, _, gapUs)).iterator
      state.remove()
      out
    } else {
      val closed = mergeEvents(gapUs, userId, events, state)
      if (state.exists) state.setTimeoutDuration(idleMs)
      closed
    }
  }

  /** Streaming entry point (Append mode, event-time timeout). Also works
    * on a batch Dataset (state is per-invocation then). */
  def sessionize(events: Dataset[Event], gapUs: Long = 30L * 60 * 1000000,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateGroup(gapUs))
  }

  /** Entry point with bootstrap state (the KS "restore state from a
    * table" analog): open sessions precomputed offline — e.g. by the
    * batch sessionizer over history — seed the stateful operator, so a
    * migration to streaming continues half-open sessions instead of
    * splitting them at the cutover point. */
  def sessionizeFromState(events: Dataset[Event],
      initial: Dataset[(Long, OpenSession)],
      gapUs: Long = 30L * 60 * 1000000,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val tupleEnc = Encoders.tuple(Encoders.scalaLong, stateEnc)
    val initKV = initial.groupByKey(_._1)(Encoders.scalaLong)
      .mapValues(_._2)(stateEnc)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout,
        initKV)(updateGroup(gapUs))
  }

  /** Streaming entry point, processing-time timeout flavor: sessions close
    * on the event-time gap as usual, and additionally after `idleMs` of
    * wall-clock silence per key. No watermark required — emission does not
    * depend on any future data arriving. */
  def sessionizeProcTime(events: Dataset[Event],
      gapUs: Long = 30L * 60 * 1000000, idleMs: Long = 1000L): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        updateGroupProcTime(gapUs, idleMs))
  }
}
