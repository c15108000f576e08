package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps}
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val v = graft.Tables.t(spark, "/tmp/graft_sf1", "embeddings")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lshprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println("[lshprobe] n=" + v.count())
    val bands = SimilarityOps.lshBands(v)
    time("bands pass 1")(bands.agg(count(lit(1))).head())
    time("bands pass 2")(bands.agg(count(lit(1))).head())
    val fallback = bands.queryExecution.executedPlan.toString
    println("[lshprobe] codegen spans: " +
      "WholeStageCodegen".r.findAllIn(fallback).size +
      ", codegen-disabled markers: " + (if (fallback.contains("codegen id")) "n/a" else "?"))
    val cand = DedupOps.cappedBandPairs(bands, "vec_id", Seq("band_id", "bucket"))
    time("candidates")(cand.agg(count(lit(1))).head())
    time("full key")(graft.SparkEntry.queries("sim_ann_lsh")(spark, "/tmp/graft_sf1").agg(count(lit(1))).head())
    spark.stop()
  }
}
