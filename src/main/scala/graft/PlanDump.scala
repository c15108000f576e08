package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `.explain("formatted")` for named queries to files —
  * the plan evidence the optimization rounds commit under `plans/`.
  *
  * Usage (sbt): runMain graft.PlanDump <outDir> <suffix> <key1,key2,...>
  * Writes <outDir>/<key>_<suffix>.txt per key. Reads the same
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS env contract as graft.Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <keys,csv>")
    val Array(outDir, suffix, keysCsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = Sessions.harden(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (key <- keysCsv.split(',').map(_.trim).filter(_.nonEmpty)) {
      val df = SparkEntry.queries(key)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${key}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${key}_$suffix.txt " +
        s"(${txt.linesIterator.length} lines)")
    }
    spark.stop()
  }
}
