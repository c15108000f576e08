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

  /** Tamper-evidence for a committed bench ledger (round-12 verdict #1:
    * a hand-merged BENCH_SF1.json shipped with `errors:119` beside 384
    * clean timings — a state Bench.run cannot emit): the key set must
    * equal `SparkEntry.queries` exactly, and the `errors` counter must
    * equal the number of embedded `{"err":...}` entries. Any spliced or
    * stale artifact fails here instead of shipping. */
  private def assertBenchLedger(file: String): Unit = {
    val path = java.nio.file.Paths.get(file)
    assert(java.nio.file.Files.exists(path),
      s"$file missing — run graft.Bench and commit the ledger")
    val json = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val qobj = {
      val start = json.indexOf("\"queries\":{")
      assert(start >= 0, s"no queries object in $file")
      val from = start + "\"queries\":".length
      var depth = 0; var i = from
      while (i == from || depth > 0) {
        if (json.charAt(i) == '{') depth += 1
        else if (json.charAt(i) == '}') depth -= 1
        i += 1
      }
      json.substring(from, i)
    }
    // keys whose value is a number or an {err:...} object; the nested
    // "err" key itself maps to a string and is excluded by the lookahead
    val benched = "\"([A-Za-z0-9_]+)\":(?=[-0-9{])".r
      .findAllMatchIn(qobj).map(_.group(1)).toSet
    val declared = SparkEntry.queries.keySet
    val missing = declared -- benched
    val stale = benched -- declared
    assert(missing.isEmpty && stale.isEmpty,
      s"$file ledger drift — missing: ${missing.toSeq.sorted.mkString(",")}; " +
        s"stale: ${stale.toSeq.sorted.mkString(",")}")
    val embeddedErrs = "\\{\"err\":".r.findAllMatchIn(qobj).length
    val declaredErrs = "\"errors\":(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
    assert(declaredErrs.contains(embeddedErrs),
      s"$file errors counter ${declaredErrs.getOrElse(-1)} != " +
        s"$embeddedErrs embedded err entries — artifact is not verbatim " +
        "Bench.run output")
  }

  test("BENCH_LOCAL.json covers exactly the SparkEntry.queries key set") {
    // The driver's BENCH tail truncates; BENCH_LOCAL.json (written by
    // Bench.main) is the authoritative per-key record — so a key
    // silently dropped from (or added to) the engine surface must fail
    // CI here instead of hiding behind the truncated tail. Regenerate
    // with: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench"
    assertBenchLedger("BENCH_LOCAL.json")
  }

  test("BENCH_SF1.json is verbatim Bench output over the full key set") {
    // Regenerate with: Test/runMain graft.ScaleGen /root/testdata/sf0.1
    // /tmp/graft_sf1 10, then SPARK_GRAFT_SF_DIR=/tmp/graft_sf1
    // SPARK_GRAFT_REPS=1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_SF1.json
    // sbt "runMain graft.Bench"
    assertBenchLedger("BENCH_SF1.json")
  }

  test("BENCH_ENVELOPE.json covers exactly the SparkEntry.queries key set") {
    // Round-13 verdict task 2: the envelope (3 same-code sf0.1 sweeps,
    // tools/bench_envelope.py) is the noise baseline next round's
    // regression gate diffs against — a STALE envelope (cut before the
    // round's last keys landed) silently removes those keys from the
    // gate. Enforce key-set ≡ SparkEntry.queries on the min/max maps.
    val path = java.nio.file.Paths.get("BENCH_ENVELOPE.json")
    assert(java.nio.file.Files.exists(path),
      "BENCH_ENVELOPE.json missing — run 3x graft.Bench at sf0.1 then tools/bench_envelope.py")
    val json = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val keys = "\"([A-Za-z0-9_]+)\":\\s*\\{\\s*\"max\"".r
      .findAllMatchIn(json).map(_.group(1)).toSet
    val declared = SparkEntry.queries.keySet
    val missing = declared -- keys
    val stale = keys -- declared
    assert(missing.isEmpty && stale.isEmpty,
      s"BENCH_ENVELOPE drift — missing: ${missing.toSeq.sorted.mkString(",")}; " +
        s"stale: ${stale.toSeq.sorted.mkString(",")}")
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
