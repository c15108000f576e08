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

  test("spherical k-means: objective is monotone non-decreasing (Lloyd invariant)") {
    val v = clusteredVecs().persist()
    try {
      val (cent, objs) = SimilarityOps.sphericalKmeans(v, k = 4, iters = 5)
      assert(objs.length == 5)
      objs.zip(objs.tail).foreach { case (a, b) =>
        assert(b >= a - 1e-9, s"objective decreased: $objs") }
      // 4 tight unit clusters, 4 centroids → near-perfect fit: each
      // vector's dot with its centroid approaches 1, so Σ ≈ 100.
      assert(objs.last > 90, s"converged objective too low: ${objs.last}")
      assert(cent.count() <= 4)
    } finally v.unpersist()
  }

  test("spherical k-means recovers planted clusters intact") {
    val v = clusteredVecs().persist()
    try {
      val (cent, _) = SimilarityOps.sphericalKmeans(v, k = 4, iters = 5)
      // assign with the trained centroids: every planted cluster must
      // land wholly in one cell (converged Lloyd on well-separated data)
      val assigned = SimilarityOps.assignCells(v, cent)
      val byCluster = assigned.collect()
        .map(r => (r.getAs[Long]("vec_id") / 25, r.getAs[Long]("cell_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq).toMap
      byCluster.foreach { case (c, cells) =>
        assert(cells.size == 1, s"planted cluster $c split across cells $cells") }
      // and distinct clusters occupy distinct cells
      assert(byCluster.values.flatten.toSet.size == 4, s"$byCluster")
    } finally v.unpersist()
  }

  test("sim_kmeans_train emits a deterministic per-iteration trace") {
    val r1 = SparkEntry.queries("sim_kmeans_train")(spark, sfDir).collect()
    val r2 = SparkEntry.queries("sim_kmeans_train")(spark, sfDir).collect()
    assert(r1.sameElements(r2), "training trace must be reproducible")
    assert(r1.length == 4)
    val objs = r1.map(_.getDouble(1)).toSeq
    objs.zip(objs.tail).foreach { case (a, b) =>
      assert(b >= a - 1e-9, s"objective decreased on real table: $objs") }
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

  test("bucketed IVF index probes from disk: no corpus scan, pruned buckets, fresh session") {
    spark.sql("DROP TABLE IF EXISTS ivf_idx")
    spark.sql("DROP TABLE IF EXISTS ivf_idx_centroids")
    val v = Tables.t(spark, sfDir, "embeddings")
    SimilarityOps.ivfIndexSave(v, k = 16, "ivf_idx", nBuckets = 16)

    // in-session reference BEFORE dropping state (same build → same result)
    val (index, cent) = SimilarityOps.ivfIndex(v, k = 16)
    val q = v.filter(col("vec_id") < 10)
    val expected = SimilarityOps.ivfSearch(q, index, cent, nprobe = 2, topK = 5)
      .collect().map(_.toSeq)
    index.unpersist(); cent.unpersist()

    // fresh session (shared catalog, clean temp/cache state) + cold cache:
    // the probe must run entirely off the persisted tables
    val s2 = spark.newSession()
    s2.catalog.clearCache()
    val q2 = Tables.t(s2, sfDir, "embeddings").filter(col("vec_id") < 10)
    val res = SimilarityOps.ivfSearchTable(s2, q2, "ivf_idx", nprobe = 2, topK = 5)
    assert(res.collect().map(_.toSeq).sameElements(expected))

    // plan proof: the ranking side scans ONLY the bucketed index table —
    // pruned to the probed buckets — never embeddings.parquet. (The tiny
    // query-vector side legitimately reads its 10 rows from the corpus.)
    val probeCells = res.queryExecution.executedPlan.toString
    val formatted = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val idxScans = formatted.linesIterator
      .filter(l => l.contains("Scan") && l.contains("ivf_idx")).toSeq
    assert(idxScans.nonEmpty, formatted)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(formatted)
    assert(sel.isDefined, s"no bucket pruning in plan:\n$formatted")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
      s"bucket pruning selected all buckets: ${sel.get.matched}\n$probeCells")

    spark.sql("DROP TABLE IF EXISTS ivf_idx")
    spark.sql("DROP TABLE IF EXISTS ivf_idx_centroids")
  }

  test("ivfSearchTable enforces its driver probe-row bound") {
    spark.sql("DROP TABLE IF EXISTS ivf_guard_idx")
    spark.sql("DROP TABLE IF EXISTS ivf_guard_idx_centroids")
    val v = clusteredVecs()
    SimilarityOps.ivfIndexSave(v, k = 4, "ivf_guard_idx", nBuckets = 4)
    val q = v.filter(col("vec_id") % 25 === 0) // 4 queries × nprobe 2 = 8 probe rows
    val ex = intercept[IllegalArgumentException] {
      SimilarityOps.ivfSearchTable(spark, q, "ivf_guard_idx", nprobe = 2,
        topK = 5, maxDriverProbeRows = 7L)
    }
    assert(ex.getMessage.contains("maxDriverProbeRows"))
    // exactly at the bound the collect proceeds and the search works
    val ok = SimilarityOps.ivfSearchTable(spark, q, "ivf_guard_idx", nprobe = 2,
      topK = 5, maxDriverProbeRows = 8L)
    assert(ok.count() == 4 * 5)
    spark.sql("DROP TABLE IF EXISTS ivf_guard_idx")
    spark.sql("DROP TABLE IF EXISTS ivf_guard_idx_centroids")
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
