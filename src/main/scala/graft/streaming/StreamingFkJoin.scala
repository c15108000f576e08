package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming TABLE⋈TABLE foreign-key join (§2.8 extension) — the analog
  * of Kafka Streams' `KTable.join(other, foreignKeyExtractor, ...)`
  * (KIP-213, Kafka 2.4): a fact changelog (orders, keyed by order id,
  * carrying a customer FK) continuously enriched by a dimension
  * changelog (customers, keyed by the FK), with UPDATE-MODE re-emission
  * on EITHER side's change — a dimension upsert re-emits every joined
  * fact under that key with the new dimension value, which is exactly
  * what distinguishes the FK join from a stream-static lookup (stale
  * enrichment) or a stream-stream interval join (no table semantics).
  *
  * Spark-first shape: Kafka Streams needs the two-hop subscription
  * topology because facts stay partitioned by their PRIMARY key; here
  * both changelogs union into ONE feed shuffled by the FK, and a single
  * `transformWithState` processor holds (dimension row, fact map) per
  * FK — one exchange total, no subscription round-trip. Per-key state is
  * the dimension value plus the facts currently referencing that key
  * (`MapState`, point-updated — never rewritten wholesale), the same
  * bounded-per-key contract as the sessionizers: a key's state is its
  * live fan-in, independent of stream length, and RocksDB spills it.
  *
  * Upsert-order contract: `seq` is the changelog offset (strictly
  * increasing per key in any real changelog); the processor applies a
  * micro-batch's rows in `seq` order, so table semantics (last write
  * wins) hold under any chunking of an ordered feed. Emission: Update
  * mode; the latest emission per order id (max `seq`) IS the joined
  * table row. Inner-join semantics as the KS default: a fact with no
  * dimension yet emits nothing and joins retroactively when the
  * dimension row arrives (via the dim-side re-emission).
  *
  * Scope: a fact's FK is immutable across its upserts (an order does not
  * change customers) — the overwhelmingly common changelog shape. A
  * mutable-FK feed needs the old-key retraction KS implements with its
  * subscription store; that retraction record would arrive here as a
  * tombstone on the OLD key, which this processor does not model.
  */
object StreamingFkJoin {

  /** One changelog record, either side: `is_dim` picks the union arm.
    * Fact rows populate (order_id, amount_micro); dim rows populate
    * segment. amount rides the repo's exact micro-unit lattice. */
  case class FkChange(cust_key: Long, is_dim: Boolean, order_id: Long,
      amount_micro: Long, segment: String, seq: Long)

  case class FkOut(order_id: Long, cust_key: Long, amount_micro: Long,
      segment: String, seq: Long)

  case class DimState(segment: String, seq: Long)

  class FkJoinProcessor
      extends StatefulProcessor[Long, FkChange, FkOut] {

    @transient private var dim: ValueState[DimState] = _
    @transient private var facts: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      dim = getHandle.getValueState[DimState]("dim",
        Encoders.product[DimState], TTLConfig.NONE)
      facts = getHandle.getMapState[Long, Long]("facts",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[FkChange],
        timerValues: TimerValues): Iterator[FkOut] = {
      val sorted = rows.toVector.sortBy(_.seq)
      val out = Vector.newBuilder[FkOut]
      sorted.foreach { c =>
        if (c.is_dim) {
          dim.update(DimState(c.segment, c.seq))
          // the FK-join contract: a dimension change re-emits every
          // fact currently referencing this key with the new value
          facts.iterator().foreach { case (orderId, amount) =>
            out += FkOut(orderId, key, amount, c.segment, c.seq)
          }
        } else {
          facts.updateValue(c.order_id, c.amount_micro)
          if (dim.exists())
            out += FkOut(c.order_id, key, c.amount_micro,
              dim.get().segment, c.seq)
        }
      }
      out.result().iterator
    }
  }

  /** Streaming entry point: the unioned (fact ∪ dim) changelog, keyed by
    * the foreign key. Update-mode emission. */
  def fkJoin(changes: Dataset[FkChange]): Dataset[FkOut] = {
    implicit val outEnc = Encoders.product[FkOut]
    changes.groupByKey(_.cust_key)(Encoders.scalaLong)
      .transformWithState(new FkJoinProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
