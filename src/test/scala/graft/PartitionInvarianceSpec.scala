package graft

/** Partition-count invariance — the scale-correctness property behind the
  * DECIMAL accumulators and struct tiebreaks: a query's VALUES must not
  * depend on how many partitions the shuffle used, or results drift when
  * the same job runs on a different cluster size. Representative queries
  * (float sums, window frames, composites, mapPartitions batching) run
  * under 2 vs 32 shuffle partitions and must match byte-for-byte.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val keys = Seq("agg_hash_groupby", "agg_stats", "win_running_sum",
    "text_tfidf", "tpch_q3", "multimodal_batch_score", "pipeline_corpus_clean",
    "agg_topk_heap", "dedup_simhash",
    // round-6 integer-lattice / exact-stats keys: the bit-determinism
    // claims in their Scaladoc are exactly this property
    "ts_ewma", "ts_anomaly_sigma", "agg_corr_matrix", "graph_triangles",
    "pipeline_cluster_sample",
    // round-7 integer-lattice / exact-stats keys
    "ts_holt", "ts_cusum_changepoint", "ts_autocorr_lag1", "graph_kcore",
    "text_jaccard_knn", "sessionize_stats",
    // round-11 continuation: StatsExt exact-release keys (lattice sums,
    // hi/lo releases, salted relabelings — all claim partition freedom)
    "agg_spearman_corr", "agg_permutation_test", "agg_bh_fdr",
    "agg_sprt_sequential")

  private def runAt(parts: Int, key: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try SparkEntry.queries(key)(spark, sfDir).collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  keys.foreach { key =>
    test(s"$key is invariant to shuffle partition count (2 vs 32)") {
      assert(runAt(2, key) == runAt(32, key))
    }
  }
}
