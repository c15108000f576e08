package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only measurement main (test scope, like [[AnnScaleProbe]] — not
  * part of the shipped library): recall/drift of the round-13 `_capped`
  * miner twins vs their exact siblings at an arbitrary scale point, so
  * SCALE.md's 3-point drift table (sf0.1 / 10× / 30×) is MEASURED, not
  * asserted. Metrics mirror the OperatorSmokeSpec pins exactly:
  * subset + key-set recall for the thresholded twins, top-1 agreement +
  * mean |score drift| for the knn twin, decile mass-share drift for the
  * sweep.
  *
  * Usage: sbt "Test/runMain graft.CappedDriftProbe <sfDir> <label>"
  * (the dir needs only documents.parquet — generate 30× docs via
  *  ScaleGen <in> <out> 30 documents).
  */
object CappedDriftProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, label) = args.take(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(key: String): (DataFrame, Double) = {
      val df = SparkEntry.queries(key)(spark, dir)
      val (_, s) = timed(df.count())
      (df, s)
    }

    println(s"[capped-drift] point=$label dir=$dir")
    // fault isolation: a memory-starved section (both pair memos live at
    // the 10x+ points) must not take down the sections after it
    def section(name: String)(body: => Unit): Unit =
      try body catch { case e: Throwable =>
        println(s"[capped-drift] $name FAILED: ${e.getMessage}".take(200)) }
    // thresholded twins: subset + recall on the pinned key columns
    for ((exact, capped, cols) <- Seq(
        ("dedup_ngram_jaccard", "dedup_ngram_jaccard_capped", Seq("d1", "d2")),
        ("dedup_containment", "dedup_containment_capped", Seq("d1", "d2")),
        ("text_contamination", "text_contamination_capped", Seq("test_id")))) section(capped) {
      val (e, te) = run(exact)
      val (c, tc) = run(capped)
      val ek = e.select(cols.map(col): _*).collect().map(_.toSeq).toSet
      val ck = c.select(cols.map(col): _*).collect().map(_.toSeq).toSet
      val recall = if (ek.isEmpty) 1.0 else (ck & ek).size.toDouble / ek.size
      println(f"[capped-drift] $capped%-28s exact=${ek.size}%6d capped=${ck.size}%6d " +
        f"subset=${ck.subsetOf(ek)} recall=$recall%.4f t_exact=$te%.2fs t_capped=$tc%.2fs")
    }
    // knn twin: top-1 agreement + mean |top-1 score drift|
    section("text_jaccard_knn_capped") {
      def top1(k: String): (Map[Long, (Long, Double)], Double) = {
        val (df, s) = run(k)
        (df.filter(col("rk") === 1).collect()
          .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap, s)
      }
      val (e, te) = top1("text_jaccard_knn")
      val (c, tc) = top1("text_jaccard_knn_capped")
      val common = e.keySet & c.keySet
      val agree = common.count(d => e(d)._1 == c(d)._1).toDouble / common.size
      val drift = common.iterator.map(d => math.abs(e(d)._2 - c(d)._2)).sum / common.size
      println(f"[capped-drift] text_jaccard_knn_capped      docs=${e.size}%6d common=${common.size}%6d " +
        f"top1_agree=$agree%.4f mean_drift=$drift%.6f t_exact=$te%.2fs t_capped=$tc%.2fs")
    }
    // sweep: decile mass-share drift (the round-12 pin's metric)
    section("dedup_threshold_sweep_capped") {
      def hist(k: String): (Map[Int, Long], Double) = {
        val (df, s) = run(k)
        (df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap, s)
      }
      val (e, te) = hist("dedup_threshold_sweep")
      val (c, tc) = hist("dedup_threshold_sweep_capped")
      val (totE, totC) = (e.values.sum.toDouble, c.values.sum.toDouble)
      val maxDrift = (e.keySet ++ c.keySet).iterator.map(d =>
        math.abs(e.getOrElse(d, 0L) / totE - c.getOrElse(d, 0L) / totC)).max
      println(f"[capped-drift] dedup_threshold_sweep_capped pairs_exact=${totE.toLong}%8d " +
        f"pairs_capped=${totC.toLong}%8d thin=${1 - totC / totE}%.4f " +
        f"max_share_drift=$maxDrift%.6f t_exact=$te%.2fs t_capped=$tc%.2fs")
    }
    spark.stop()
  }
}
