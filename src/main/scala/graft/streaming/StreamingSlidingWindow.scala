package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming EVENT-ALIGNED trailing window (§2.8 extension) — the analog
  * of Kafka Streams' `SlidingWindows` (KIP-450, Kafka 2.7/3.0): each
  * event gets an aggregate over the window [ts − Δ, ts] ENDING AT ITS
  * OWN event time, not at a grid boundary — where tumbling/hopping
  * windows quantize ("how much in the 14:00–15:00 bucket"), the sliding
  * window answers the per-event question ("how much in the hour ending
  * NOW"), which is the rate-limit / fraud-velocity / rolling-exposure
  * readout. This is the streaming twin of the batch `win_range_frame`
  * key (a RANGE frame of [-Δ, 0] over event time per user) — the parity
  * test pins the two to the same rows.
  *
  * Per-key state is the event buffer of the LAST Δ of event time only:
  * after a micro-batch, entries older than (key HWM − Δ) can no longer
  * enter any future event's trailing window (ordered-arrival contract,
  * below) and are evicted — the same bounded-by-Δ state contract as the
  * sessionizers, however long the stream runs.
  *
  * Parity contract (as StreamingEwma): exact when each key's arrivals
  * respect event-time order across micro-batches (the watermark-
  * disciplined feed); within a micro-batch the processor inserts ALL
  * rows before scoring any (so same-batch, same-window events see each
  * other regardless of arrival interleaving), then emits one row per
  * event. The `vi` micro-unit column is computed UPSTREAM by the same
  * decimal cast the batch query uses, the trailing sum folds exact
  * longs, and the released double divides the exact micro total by 1e6
  * — one correctly-rounded IEEE op, bit-identical to the batch key's
  * DECIMAL-sum→double cast.
  */
object StreamingSlidingWindow {

  case class EventIn(user_id: Long, event_id: Long, us: Long, vi: Long)

  case class SlideEntry(us: Long, vi: Long)

  case class SlideBuf(entries: Seq[SlideEntry], hwm: Long)

  case class SlideOut(event_id: Long, user_id: Long, sum_win: Double)

  class SlidingProcessor(windowUs: Long)
      extends StatefulProcessor[Long, EventIn, SlideOut] {

    @transient private var buf: ValueState[SlideBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[SlideBuf]("buf",
        Encoders.product[SlideBuf], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[SlideOut] = {
      val batch = rows.toVector.sortBy(e => (e.us, e.event_id))
      val prev = if (buf.exists()) buf.get() else SlideBuf(Vector.empty, Long.MinValue)
      // insert ALL batch rows first: a RANGE frame includes its event-time
      // peers, so two same-window events in one micro-batch must see each
      // other whichever arrived "first"
      val entries = (prev.entries ++ batch.map(e => SlideEntry(e.us, e.vi)))
        .sortBy(_.us)
      val out = batch.map { e =>
        var sum = 0L
        entries.foreach { en =>
          if (en.us >= e.us - windowUs && en.us <= e.us) sum += en.vi
        }
        SlideOut(e.event_id, key, sum / 1e6)
      }
      // evict: entries at us < hwm − Δ can never re-enter a trailing
      // window under the ordered-arrival contract
      val hwm = math.max(prev.hwm, batch.map(_.us).max)
      buf.update(SlideBuf(entries.filter(_.us >= hwm - windowUs), hwm))
      out.iterator
    }
  }

  /** Streaming entry point: one trailing-window emission per event.
    * `windowUs` is the Δ of [ts − Δ, ts] in event-time microseconds. */
  def slidingSum(events: Dataset[EventIn], windowUs: Long): Dataset[SlideOut] = {
    implicit val outEnc = Encoders.product[SlideOut]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SlidingProcessor(windowUs),
        TimeMode.None(), OutputMode.Append())
  }
}
