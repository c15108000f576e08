package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only probe (test scope, never shipped): measures the rank-test
  * value-domain machine OLD (round-10 single window per event_type —
  * the |types|-task parallelism floor) vs NEW (round-11 two-level
  * bucketed cumsum, the shipped `AnalyticsExt.denseTypeValueCum`) on a
  * given events dir, plus the three shipped keys end-to-end. Pair with
  * the `continuous-events` ScaleGen mode, whose per-replica value
  * perturbation grows the distinct-value domain ~linearly with the
  * corpus — the regime where the old machine's per-type window input
  * approaches corpus size.
  *
  *   sbt "Test/runMain graft.RankProbe /root/testdata/sf0.1"
  *   sbt "Test/runMain graft.RankProbe /tmp/graft_sf1c"
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-rank-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables._

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[rank] $dir%s $label%-28s min=${times.min}%.2fs")
    }

    // The deprecated round-10 shape, kept HERE only as the probe's
    // baseline: one cumsum window per event_type over the whole
    // densified value domain.
    def oldCum = {
      val vc = events(spark, dir).groupBy("event_type", "value")
        .agg(count(lit(1)).as("cnt"))
      val vals = vc.select("value").distinct()
      val types = vc.select("event_type").distinct()
      val dense = vals.crossJoin(broadcast(types))
        .join(vc, Seq("event_type", "value"), "left")
        .na.fill(0L, Seq("cnt"))
      val w = Window.partitionBy("event_type").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dense.withColumn("cum", sum("cnt").over(w))
    }

    val domain = events(spark, dir).agg(
      count(lit(1)), count_distinct(col("value"))).head()
    println(s"[rank] $dir events=${domain.getLong(0)} distinct_values=${domain.getLong(1)}")
    time("cum OLD single-window")(oldCum.count())
    time("cum NEW two-level")(
      operators.AnalyticsExt.denseTypeValueCum(spark, dir).count())
    for (k <- Seq("agg_mann_whitney", "agg_ks_test", "agg_kruskal_wallis"))
      time(s"$k (shipped)")(SparkEntry.queries(k)(spark, dir).count())
    spark.stop()
  }
}
