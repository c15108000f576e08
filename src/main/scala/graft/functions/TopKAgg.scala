package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k largest (value, id) pairs per
  * group — the scale-path alternative to `rank().over(Window)` top-k.
  *
  * A window rank sorts every partition's full row set before discarding
  * all but k rows; this aggregator is a mergeable bounded buffer — partial
  * aggregation truncates to k on the map side, so only `groups × k` pairs
  * ever cross the shuffle, and nothing is globally sorted. Ordering is the
  * total order (value desc, id asc), making results deterministic and the
  * DuckDB row_number oracle exact.
  *
  * The buffer stays a sorted Vector (≤ k+1 elements during reduce), so
  * each insert is O(k) — for the small k of "top-k per group" that beats
  * heap bookkeeping, and the buffer encodes as a plain Seq.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.lengthCompare(k) >= 0 && ord.gteq(x, buf.last)) buf
    else ((buf :+ x).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
