package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** IVF ANN properties: on clustered data the coarse quantizer must
  * recover same-cluster neighbors; on the real table the search is
  * deterministic and its similarities are exact dot products.
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** 4 tight clusters × 25 unit-ish vectors in 8 dims, deterministic.
    * Cluster c lives on axis pair (2c, 2c+1); members are tiny rotations
    * of the cluster direction, so true nearest neighbors are always
    * same-cluster. */
  private def clusteredVecs() = {
    val rows = for {
      c <- 0 until 4
      i <- 0 until 25
    } yield {
      val theta = 0.05 * i
      val v = Array.fill(8)(0.0f)
      v(2 * c) = math.cos(theta).toFloat
      v(2 * c + 1) = math.sin(theta).toFloat
      (c * 25L + i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF search recovers same-cluster neighbors on clustered data") {
    val v = clusteredVecs()
    val (index, cent) = SimilarityOps.ivfIndex(v, k = 4)
    // one query per cluster (ids 0, 25, 50, 75)
    val res = SimilarityOps.ivfSearch(v.filter(col("vec_id") % 25 === 0), index,
      cent, nprobe = 1, topK = 5).collect()
    assert(res.length == 4 * 5)
    // every neighbor must come from the query's own cluster
    res.foreach { r =>
      val q = r.getLong(0); val c = r.getLong(1)
      assert(c / 25 == q / 25, s"query $q got cross-cluster neighbor $c")
    }
  }

  test("IVF assigns every vector and keeps clusters coherent") {
    val v = clusteredVecs()
    val (index, _) = SimilarityOps.ivfIndex(v, k = 4)
    assert(index.count() == 100)
    // one Lloyd step from random seeds need not balance cells perfectly,
    // but each tight cluster must keep a majority of its members together
    val assign = index.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell_id"))
    for (c <- 0 until 4) {
      val cells = assign.filter(_._1 / 25 == c).map(_._2)
      val majority = cells.groupBy(identity).values.map(_.length).max
      assert(majority >= 13, s"cluster $c scattered: ${cells.toSeq.distinct}")
    }
  }

  test("sim_ivf_knn is deterministic and returns exact dot products") {
    val r1 = SparkEntry.queries("sim_ivf_knn")(spark, sfDir).collect()
    val r2 = SparkEntry.queries("sim_ivf_knn")(spark, sfDir).collect()
    assert(r1.length == r2.length && r1.sameElements(r2))
    assert(r1.length == 10 * 5)
    // per-query ranks are 1..5 with non-increasing similarity
    r1.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 5))
      val sims = sorted.map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF index materializes: corpus is scanned a bounded number of times") {
    val acc = spark.sparkContext.longAccumulator("corpus-touches")
    val touch = udf { (id: Long) => acc.add(1L); id }
    val v = clusteredVecs().withColumn("vec_id", touch(col("vec_id")))
    val (index, cent) = SimilarityOps.ivfIndex(v, k = 4)
    val res = SimilarityOps.ivfSearch(v.filter(col("vec_id") % 25 === 0), index,
      cent, nprobe = 1, topK = 5).collect()
    assert(res.nonEmpty)
    // Build+search lineage is 4 corpus passes (seed pick, seed-assign,
    // refined-assign, query filter); the round-1 uncached formulation
    // replayed ~9. Bound at 6 to allow cache-population races.
    val n = 100L
    assert(acc.value <= 6 * n, s"corpus touched ${acc.value} rows (> ${6 * n})")
    index.unpersist(); cent.unpersist()
  }

  test("IVF recall beats the random-probe floor on the real table") {
    val v = Tables.t(spark, sfDir, "embeddings")
    val truth = SparkEntry.queries("sim_knn_per_query")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("sim_ivf_knn")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & ivf).size.toDouble / truth.size
    // probing 2/16 cells scans ~1/8 of the corpus; random probing would
    // recall ~0.125 — the quantizer must do meaningfully better
    assert(recall > 0.25, s"recall=$recall (n=${v.count()})")
  }
}
