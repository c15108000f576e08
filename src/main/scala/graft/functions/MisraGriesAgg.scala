package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a typed mergeable UDAF — the
  * DETERMINISTIC counterpart of `approx_top_k` (`agg_approx_top_k`):
  * no randomness, and hard guarantees instead of probabilistic ones.
  * With `k` counters over a stream of N items:
  *
  *   - every item with true frequency > N/k is IN the summary
  *     (no false negatives above the threshold), and
  *   - each reported count underestimates the true count by at most
  *     N/k: true − N/k ≤ estimate ≤ true.
  *
  * Both bounds are pinned against exact counts in OperatorSmokeSpec.
  *
  * The 100 TB shape: each partition folds its items into a ≤ k−1-entry
  * map (classic MG decrement step), and partials combine with the
  * Agarwal et al. (PODS 2012) mergeable-summaries rule — sum the maps,
  * then subtract the k-th largest count from everything and drop the
  * non-positives, restoring the size bound. Merge is commutative and
  * size-bounded, so this runs as a two-phase ObjectHashAggregate:
  * only k-entry maps cross the wire, never item-level data — the same
  * no-corpus-shuffle story as the count-min and HLL keys, but exact-
  * bounded and reproducible run to run.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, "Misra-Gries needs at least 2 counters")

  override def zero: Map[String, Long] = Map.empty

  /** Classic MG fold: increment a tracked item, insert while below the
    * k−1 size bound, otherwise decrement ALL counters (dropping zeros) —
    * the step that charges each untracked arrival against k−1 tracked
    * counts and yields the N/k error bound. */
  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c) => b.updated(w, c + 1)
      case None if b.size < k - 1 => b.updated(w, 1L)
      case None =>
        b.flatMap { case (x, c) => if (c > 1) Some(x -> (c - 1)) else None }
    }

  /** Mergeable-summaries combine: pointwise sum, then if the union
    * tracks ≥ k items, subtract the k-th largest count from every
    * counter and keep the positives (≤ k−1 survive by construction).
    * Commutative; deterministic for a fixed pair of inputs. */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val s = b.foldLeft(a) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (s.size < k) s
    else {
      val kth = s.valuesIterator.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
      s.flatMap { case (w, c) => if (c > kth) Some(w -> (c - kth)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  // ExpressionEncoder (not kryo): the buffer serializes as a native
  // MapType — partials stay columnar on the wire and the finished
  // summary lands as a real map column the query can explode.
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
