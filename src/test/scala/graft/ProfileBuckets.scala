package graft

import graft.operators.{DedupOps, SimilarityOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (test scope, like ScaleGen/StreamScale — never shipped):
  * prints the bucket-size distribution of the two sketch-path band joins
  * so `DedupOps.HotBucketCap` stays anchored to measured corpora instead
  * of guesswork. Usage:
  *
  *   sbt "Test/runMain graft.ProfileBuckets /root/testdata/sf0.1 [moreDirs...]"
  */
object ProfileBuckets {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-profile-buckets")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try args.foreach { dir => report(spark, dir) }
    finally spark.stop()
  }

  private def report(spark: SparkSession, dir: String): Unit = {
    def stats(name: String, banded: org.apache.spark.sql.DataFrame,
        id: String, keys: Seq[String]): Unit = {
      val sizes = banded.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("c")).select("c").cache()
      val r = sizes.agg(max("c"), expr("percentile(c, 0.999)"),
        expr("percentile(c, 0.99)"), count(lit(1)),
        sum(expr("c * (c - 1) / 2"))).head()
      println(f"[buckets] $dir%s $name%s: max=${r.getLong(0)}%d " +
        f"p999=${r.getDouble(1)}%.1f p99=${r.getDouble(2)}%.1f " +
        f"buckets=${r.getLong(3)}%d allPairsSum=${r.getDouble(4)}%.0f")
      sizes.unpersist()
    }
    stats("minhash16x4",
      DedupOps.minhashBands(spark, dir), "doc_id", Seq("band_id", "band_hash"))
    stats("lshAdaptive",
      SimilarityOps.lshBands(spark, dir), "vec_id", Seq("band_id", "bucket"))
  }
}
