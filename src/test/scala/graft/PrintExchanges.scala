package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev-only: print pre-AQE hash-exchange counts for the given keys
  * (used to derive PlanSpec ceilings for new operators). */
object PrintExchanges {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.foreach { key =>
      spark.sharedState.cacheManager.clearCache()
      val p = SparkEntry.queries(key)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      println(s"[exchanges] $key = $n")
    }
    spark.stop()
  }
}
