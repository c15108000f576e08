package graft

import graft.operators.RelationalExt
import org.apache.spark.sql.functions._

/** Property suite for the logistic-regression trainer behind
  * `pipeline_quality_classifier` (no DuckDB oracle by design — iterative
  * trainer): convex-descent monotonicity, planted-separation recovery,
  * and bit-determinism across partitionings (the decimal-lattice
  * contract every trainer in this repo shares).
  */
class ClassifierSpec extends SparkSpec {

  test("corpus key: loss strictly decreases from ln 2; final accuracy >= 0.75") {
    val rows = SparkEntry.queries("pipeline_quality_classifier")(spark, sfDir)
      .collect()
    assert(rows.length == 9, s"expected 8 steps + final eval, got ${rows.length}")
    val losses = rows.map(_.getDouble(1))
    assert(math.abs(losses.head - math.log(2.0)) < 1e-4,
      s"trajectory must start at w=0 (loss ln 2), got ${losses.head}")
    losses.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"full-batch GD on a convex loss must descend: $a -> $b")
    }
    assert(rows.last.getDouble(2) >= 0.75,
      s"final train accuracy ${rows.last.getDouble(2)} below 0.75")
  }

  test("planted separation: margin-separated synthetic data is fully recovered") {
    import spark.implicits._
    // deterministic lattice points, labels = linear rule with a 0.15
    // margin band removed — separable with real margin, so enough
    // descent steps must classify every point correctly
    val feats = (0 until 400).map { i =>
      val x1 = (i % 20) / 19.0
      val x2 = ((i * 7) % 23) / 22.0
      (x1, x2, if (x1 + x2 > 1.0) 1.0 else 0.0)
    }.filter { case (x1, x2, _) => math.abs(x1 + x2 - 1.0) > 0.15 }
      .toDF("x1", "x2", "y")
    val trace = RelationalExt.logisticTrain(feats, Seq("x1", "x2"), "y",
      iters = 60, lr = 2.0)
    val losses = trace.map(_._2)
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss rose on separable data: $a -> $b")
    }
    assert(trace.last._3 == 1.0,
      s"planted separation not recovered: accuracy ${trace.last._3}")
  }

  test("bit-determinism: identical trace under different partitionings") {
    import spark.implicits._
    val base = (0 until 300).map { i =>
      ((i % 13) / 12.0, (i % 7) / 6.0, (i % 3).toDouble.min(1.0))
    }.toDF("x1", "x2", "y")
    val a = RelationalExt.logisticTrain(base.repartition(1), Seq("x1", "x2"), "y",
      iters = 10, lr = 1.5)
    val b = RelationalExt.logisticTrain(base.repartition(17), Seq("x1", "x2"), "y",
      iters = 10, lr = 1.5)
    // exact equality, doubles included: the decimal-lattice reduction
    // makes the gradient independent of partition count and row order
    assert(a == b, "trace differs across partitionings")
  }
}
