package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiler: times the heaviest bench queries warm (not part of
  * the shipped library). */
object ProfileJac {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }

  def main(args: Array[String]): Unit = {
    val s = Sessions.harden(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val keys = if (args.nonEmpty) args.toSeq
      else Seq("dedup_ngram_jaccard", "dedup_near_minhash", "text_edit_distance",
        "sim_cosine_topk", "dedup_embed_cosine", "window_sliding")
    for (k <- keys) {
      // special probe: time BOTH connectedComponents regimes on the real
      // simhash pair graph (the router would send a small graph to
      // union-find; edgesPerTask=1 forces the distributed iterative path)
      // — the measured crossover evidence behind EdgesPerPartition.
      if (k == "cc_regimes") {
        import graft.operators.DedupOps
        val docs = graft.Tables.t(s, dir, "documents")
        val pairs = DedupOps.simhashPairs(docs, maxHamming = 3).persist()
        println(s"  cc pair graph: ${pairs.count()} undirected edges")
        for (_ <- 1 to 2) {
          time("cc routed (union-find)")(
            DedupOps.connectedComponents(pairs).count())
          time("cc forced-iterative")(
            DedupOps.connectedComponents(pairs, edgesPerTask = 1L).count())
        }
        pairs.unpersist()
      } else {
        time(s"$k cold")(SparkEntry.queries(k)(s, dir).count())
        time(s"$k warm")(SparkEntry.queries(k)(s, dir).count())
      }
    }
    s.stop()
  }
}
