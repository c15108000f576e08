package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe (test scope, like ProfileBuckets — never shipped):
  * times individual `SparkEntry.queries` keys on a given data dir with
  * the Bench warm-up + min-of-reps protocol, without paying for the full
  * 160-key sweep. Usage:
  *
  *   sbt "Test/runMain graft.ProfileKeys /root/testdata/sf0.1 key1 [key2...]"
  */
object ProfileKeys {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileKeys <sfDir> <key> [key...]")
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-profile-keys")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.tail.foreach { key =>
      val fn = SparkEntry.queries(key)
      fn(spark, dir).count() // warm
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $dir%s $key%s: min=${times.min}%.2fs runs=" +
        times.map(t => f"$t%.2f").mkString(","))
    } finally spark.stop()
  }
}
