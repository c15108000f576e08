package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only ANN recall probe at ScaleGen points (test scope, like
  * ProfileKeys — never shipped): measures, on a `ScaleGen`-expanded
  * corpus, (a) LSH banding recall of the PLANTED replica near-dup pairs
  * (ScaleGen re-emits every sf0.1 vector per rep with ±0.005 jitter, so
  * same-base cross-rep pairs at cosine ≥ 0.8 are known-true by
  * construction — the standard planted-pair recall protocol), and
  * (b) IVF recall@10 of `ivfSearch` (k=16, nprobe=2 — the sim_ivf_knn
  * shape) against brute-force exact top-10 for a ~50-query sample.
  * This is the probe behind SCALE.md's ANN recall-at-scale table; the
  * 10× LSH floor is additionally pinned in DedupSimilaritySpec.
  *
  * Usage: sbt "Test/runMain graft.AnnScaleProbe /tmp/graft_sf1 10"
  */
object AnnScaleProbe {

  /** Planted-truth recall of the adaptive LSH banding on `dir`'s
    * embeddings (factor = the ScaleGen replication factor): returns
    * (n, bits, bands, truthPairs, recalled). Distributed end to end —
    * truth and candidates never collect. */
  def lshPlantedRecall(spark: SparkSession, dir: String,
      factor: Int): (Long, Int, Int, Long, Long) = {
    import graft.operators.{DedupOps, SimilarityOps}
    import graft.functions.VecFunctions.vecDot
    val v = Tables.t(spark, dir, "embeddings")
    val n = v.count()
    val (bits, bands) = SimilarityOps.lshParams(n)
    val baseMod = (v.agg(max("vec_id")).head.getLong(0) + 1) / factor
    val vb = v.withColumn("base", col("vec_id") % baseMod)
    val truth = vb.select(col("base"), col("vec_id").as("d1"),
        col("embedding").as("e1"))
      .join(vb.select(col("base"), col("vec_id").as("d2"),
        col("embedding").as("e2")), "base")
      .filter(col("d1") < col("d2"))
      .withColumn("sim", vecDot(col("e1"), col("e2")))
      .filter(col("sim") >= 0.8)
      .select("d1", "d2").localCheckpoint()
    val cand = DedupOps.cappedBandPairs(
      SimilarityOps.lshBands(v), "vec_id", Seq("band_id", "bucket"))
      .select(col("d1"), col("d2"))
    val nTruth = truth.count()
    val recalled = truth.join(cand, Seq("d1", "d2"), "left_semi").count()
    (n, bits, bands, nTruth, recalled)
  }

  /** IVF recall@10 vs exact brute force over ~`nq` hash-sampled queries:
    * returns (nQueries, exactPairs, recalled). */
  def ivfRecallAt10(spark: SparkSession, dir: String,
      nq: Int, nprobe: Int = 2): (Long, Long, Long) = {
    import graft.operators.SimilarityOps
    import graft.functions.VecFunctions.vecDot
    val v = Tables.t(spark, dir, "embeddings")
    val n = v.count()
    val q = v.filter(pmod(xxhash64(col("vec_id")), lit(math.max(1L, n / nq))) === 0)
      .localCheckpoint()
    val exact = v.crossJoin(
        broadcast(q.select(col("vec_id").as("q_id"), col("embedding").as("qe"))))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        vecDot(col("qe"), col("embedding")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))))
      .filter(col("rk") <= 10)
      .select("q_id", "c_id").localCheckpoint()
    val (index, cent) = SimilarityOps.ivfIndex(v, k = 16)
    val got = SimilarityOps.ivfSearch(q, index, cent, nprobe, topK = 10)
      .select("q_id", "c_id")
    val nQ = q.count()
    val nExact = exact.count()
    val recalled = exact.join(got, Seq("q_id", "c_id"), "left_semi").count()
    (nQ, nExact, recalled)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AnnScaleProbe <dir> <factor>")
    val dir = args(0); val factor = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val (n, bits, bands, nTruth, lshHit) = lshPlantedRecall(spark, dir, factor)
    val lshS = (System.nanoTime() - t0) / 1e9
    println(f"[annprobe] $dir n=$n lshParams=($bits,$bands) " +
      f"plantedPairs=$nTruth lshRecall=${lshHit.toDouble / nTruth}%.4f " +
      f"(${lshS}%.1f s)")
    Seq(2, 4).foreach { np =>
      val t1 = System.nanoTime()
      val (nQ, nExact, ivfHit) = ivfRecallAt10(spark, dir, nq = 50, nprobe = np)
      val ivfS = (System.nanoTime() - t1) / 1e9
      println(f"[annprobe] $dir ivf(k=16,nprobe=$np) queries=$nQ " +
        f"recall@10=${ivfHit.toDouble / nExact}%.4f (${ivfS}%.1f s)")
    }
    spark.stop()
  }
}
