package graft

import org.apache.spark.sql.functions._

/** Bench error visibility (VERDICT round-1 #5): a deliberately broken
  * query must surface as a red `err` entry in the bench JSON, never as a
  * near-zero timing masquerading as a speedup. Plus: the LSH band join's
  * shuffles must carry ids only — vectors ride broadcasts, not shuffles.
  */
class BenchHarnessSpec extends SparkSpec {

  test("a broken query shows up red in the bench JSON") {
    val queries: Map[String, Tables.Q] = Map(
      "ok_query" -> ((s, dir) => Tables.t(s, dir, "region")),
      "broken_query" -> ((s, dir) =>
        Tables.t(s, dir, "region").select(col("no_such_column"))))
    val json = Bench.run(spark, sfDir, queries)
    assert(json.contains("\"broken_query\":{\"err\":"), json)
    assert(json.contains("\"errors\":1"), json)
    assert("\"ok_query\":[0-9.]+".r.findFirstIn(json).isDefined, json)
  }

  test("sim_ann_lsh shuffles carry ids only; vectors travel by broadcast") {
    assertNoWidePayload("sim_ann_lsh",
      c => c.contains("embedding") || c == "e1" || c == "e2")
  }

  test("dedup_near_minhash band join shuffles ids only; signatures broadcast") {
    assertNoWidePayload("dedup_near_minhash",
      c => c.startsWith("sig") || c == "bands")
  }

  /** Walk the executed plan's shuffle exchanges and assert none carries a
    * wide column — the candidate joins must shuffle narrow ids, with the
    * wide payload re-attached by broadcast afterwards. */
  private def assertNoWidePayload(key: String, wide: String => Boolean): Unit = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries(key)(spark, sfDir)
    df.collect() // materialize so AQE finalizes the physical plan
    val shuffleCols = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e.child.output.map(_.name)
    }.flatten
    val offenders = shuffleCols.filter(wide)
    assert(offenders.isEmpty,
      s"$key wide columns in shuffle payload: $offenders (all: $shuffleCols)")
  }
}
