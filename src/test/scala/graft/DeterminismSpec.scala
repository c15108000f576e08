package graft

/** Every query must be run-to-run deterministic — the driver adjudicates
  * correctness by hashing result values, so any nondeterminism (float
  * summation order, unstable sort ties, time-dependent expressions) fails
  * the round silently. Each query runs twice at sf0.001 and must return
  * byte-identical row sequences.
  */
class DeterminismSpec extends SparkSpec {

  test("all queries return identical results across two executions") {
    val flaky = SparkEntry.queries.keys.toSeq.sorted.flatMap { key =>
      val fn = SparkEntry.queries(key)
      val a = fn(spark, sfDir).collect().map(_.toString).toSeq
      val b = fn(spark, sfDir).collect().map(_.toString).toSeq
      if (a == b) None else Some(key)
    }
    assert(flaky.isEmpty, s"nondeterministic queries: $flaky")
  }
}
