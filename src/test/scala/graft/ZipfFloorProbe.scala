package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement main (test scope, like [[CappedDriftProbe]]):
  * the adaptive cap's FLOOR regime measured on the Zipf-head corpus
  * ([[ScaleGen.zipfDocs]]) — the regime SCALE.md §8.14 argues the whole
  * 100 TB skew posture from (real vocabularies are Zipfian ⇒ the rule
  * resolves to the floor 16 ⇒ per-shingle fan-out bounded), previously
  * argued from vocabulary growth laws but never measured because the
  * driver corpus has no skewed head.
  *
  * At each point it prints: the resolved cap (must be the floor), the
  * planted head df, max survivors per shingle after thinning, exact vs
  * capped pair counts, planted-twin recall for both miners, and wall
  * times — so the exact miner's superlinear head cost and the capped
  * miner's flat cost are measured side by side.
  *
  * Usage: sbt "Test/runMain graft.ZipfFloorProbe 50000 100000 200000"
  */
object ZipfFloorProbe {
  def main(args: Array[String]): Unit = {
    val points = if (args.nonEmpty) args.map(_.toLong).toSeq
                 else Seq(50000L, 100000L, 200000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (n <- points) {
      val dir = s"/tmp/graft_zipf_$n"
      ScaleGen.zipfDocs(spark, n).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val sh = Tables.t(spark, dir, "documents").select(col("doc_id"),
        explode(array_distinct(operators.TextOps.shingles(col("text"))))
          .as("shingle"))
      val cap = operators.DedupOps.minerDfCap(sh).head.getLong(0)
      val headDf = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .agg(max("df")).head.getLong(0)
      // miners: time the full τ=0 pair mine (the dominant stage of every
      // exact-Jaccard key) vs the capped twin, on fresh memo entries
      val (pairsExact, tE) = timed(
        operators.DedupOps.tau0Pairs(spark, dir).count())
      val (pairsCapped, tC) = timed(
        operators.DedupOps.cappedTau0Pairs(spark, dir).count())
      val maxSurv = operators.DedupOps.thinnedPostings(spark, dir)
        .groupBy("shingle").agg(count(lit(1)).as("c"))
        .agg(max("c")).head.getLong(0)
      // planted-twin recall at τ=0.6 for both miners
      def tauKeys(key: String): Set[(Long, Long)] =
        SparkEntry.queries(key)(spark, dir)
          .select("d1", "d2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val planted = (7L until n by 10L).map(d => (d - 1, d)).toSet
      val rec = Seq("dedup_ngram_jaccard", "dedup_ngram_jaccard_capped")
        .map { k =>
          val found = tauKeys(k)
          f"${(found & planted).size.toDouble / planted.size}%.4f"
        }
      println(f"[zipf-floor] n=$n%7d cap=$cap%3d head_df=$headDf%6d " +
        f"max_surv=$maxSurv%4d pairs_exact=$pairsExact%10d " +
        f"pairs_capped=$pairsCapped%10d t_exact=$tE%7.1fs t_capped=$tC%7.1fs " +
        s"planted_recall(exact,capped)=${rec.mkString(",")}")
    }
    spark.stop()
  }
}
