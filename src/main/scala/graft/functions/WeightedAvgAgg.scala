package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF: weight-averaged value, `sum(x*w)/sum(w)`.
  *
  * Used as `udaf_weighted_avg` (discount-weighted average extended price).
  * The buffer is a plain (weightedSum, weightSum) pair; merge is
  * associative+commutative so partial aggregation (map-side combine)
  * applies — this runs as a two-phase HashAggregate like any built-in.
  */
object WeightedAvgAgg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
