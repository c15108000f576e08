package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming sequence-pattern detector (§2.8 extension): the CEP twin of
  * the batch `ts_pattern_detect` key — count, per user, the strictly-
  * consecutive view→click→purchase triples completing within 24 hours.
  *
  * The batch key reads the pattern off two `lead` windows; the stream
  * needs only the last TWO events per user — pattern matching against a
  * fixed-length regex-like template is streaming-native with O(template)
  * state (here: two (type, ts) slots + two counters), however long the
  * stream runs. This is the Kafka-Streams/Flink-CEP shape: a tiny DFA
  * per key advanced by each arrival.
  *
  * Parity contract (pinned in StreamingSpec): adjacency is order-
  * defined, so batch ≡ stream exactness holds for arrivals respecting
  * per-key (ts, event_id) order across micro-batches; within a
  * micro-batch the processor sorts, so any chunking of an ordered feed
  * is exact. Emission: Update mode — latest emission per key (max
  * n_events) carries the final pattern count.
  */
object StreamingPattern {

  val WindowUs: Long = 24L * 3600 * 1000000

  case class EventIn(user_id: Long, event_type: String, ts_micros: Long,
      event_id: Long)

  /** Last two events (2 = most recent) + counters; empty slots are "". */
  case class PatState(t1: String, ts1: Long, t2: String, ts2: Long,
      nEvents: Long, nPatterns: Long)

  case class PatOut(user_id: Long, n_events: Long, n_patterns: Long)

  class PatternProcessor
      extends StatefulProcessor[Long, EventIn, PatOut] {

    @transient private var st: ValueState[PatState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PatState]("pat",
        Encoders.product[PatState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[PatOut] = {
      val sorted = rows.toVector.sortBy(e => (e.ts_micros, e.event_id))
      var cur = if (st.exists()) st.get() else PatState("", 0L, "", 0L, 0L, 0L)
      sorted.foreach { e =>
        val hit = cur.t1 == "view" && cur.t2 == "click" &&
          e.event_type == "purchase" && e.ts_micros - cur.ts1 <= WindowUs
        cur = PatState(cur.t2, cur.ts2, e.event_type, e.ts_micros,
          cur.nEvents + 1L, cur.nPatterns + (if (hit) 1L else 0L))
      }
      if (sorted.isEmpty) Iterator.empty
      else {
        st.update(cur)
        Iterator.single(PatOut(key, cur.nEvents, cur.nPatterns))
      }
    }
  }

  /** Streaming entry point: per-user consecutive-triple pattern counts. */
  def patterns(events: Dataset[EventIn]): Dataset[PatOut] = {
    implicit val outEnc = Encoders.product[PatOut]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new PatternProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
