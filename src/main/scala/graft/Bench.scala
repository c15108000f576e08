package graft

import org.apache.spark.sql.SparkSession

/** Bench harness (driver contract): times every `SparkEntry.queries` entry
  * on SPARK_GRAFT_SF_DIR, one JSON line to stdout.
  *
  * Each query is executed once untimed (codegen/JIT/page-cache warm) and
  * the *second* run is reported — matching BASELINE.md's "warm" numbers,
  * which is what a long-running cluster workload approximates.
  */
object Bench {

  /** Run + time each query; a query that throws is reported as an explicit
    * `{"err": ...}` entry, never as a (near-zero) timing — a regression
    * must not masquerade as a speedup. Returns the single JSON line.
    * Factored out of main so the error path is unit-testable. */
  def run(spark: SparkSession, sfDir: String,
      queries: Map[String, Tables.Q]): String = {
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warm
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map {
      case (k, v, None) => "\"" + k + "\":" + v
      case (k, _, Some(m)) =>
        "\"" + k + "\":{\"err\":\"" + m.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\"}"
    }.mkString("{", ",", "}")
    val nErr = results.count(_._3.isDefined)
    val total = results.collect { case (_, v, None) => v }.sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$nErr,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, sfDir, SparkEntry.queries))
    spark.stop()
  }
}
