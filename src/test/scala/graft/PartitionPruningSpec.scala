package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout: the other physical-layout lever besides
  * bucketing (BucketingSpec). At 100 TB the events table is laid out as
  * `event_type=<v>/date=<d>/part-*.parquet`; a predicate on the partition
  * column must prune directories at PLANNING time — zero IO for excluded
  * partitions — not filter rows after a full scan.
  */
class PartitionPruningSpec extends SparkSpec {

  test("partition filters prune the scan to matching directories only") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sfDir)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("event_type") === "purchase")

    // planning-time pruning: the scan's selected partitions exclude the
    // other event types entirely
    val scan = back.queryExecution.executedPlan.collectLeaves().head
    val meta = scan.toString
    assert(meta.contains("PartitionFilters"), meta)

    // row-level ground truth matches the unpartitioned filter (execute
    // through THIS queryExecution so its scan metrics populate)
    val qe = back.queryExecution
    val got = qe.executedPlan.executeCollect().length.toLong
    val expected = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(got == expected && expected > 0)

    // and the scan touched exactly the matching directory's files
    val scanned = qe.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
    def filesUnder(p: String) = {
      val d = new java.io.File(p)
      Option(d.listFiles()).getOrElse(Array.empty)
        .count(f => f.getName.endsWith(".parquet"))
    }
    val purchaseFiles = filesUnder(s"$dir/event_type=purchase")
    val allFiles = Option(new java.io.File(dir).listFiles()).get
      .filter(_.isDirectory).map(d => filesUnder(d.getPath)).sum
    assert(scanned == purchaseFiles, s"scanned $scanned of $purchaseFiles")
    assert(scanned < allFiles, s"no pruning: $scanned of $allFiles files read")
  }

  test("dynamic partition pruning: a dim-side filter prunes the fact scan at runtime") {
    // The 100 TB shape: fact partitioned by a key whose selective filter
    // lives on a JOINED dimension, not the fact itself. Static pruning
    // can't help; Spark must inject a dynamicpruning subquery that reuses
    // the broadcast to skip fact partitions at runtime.
    val dir = Files.createTempDirectory("graft_dpp").toString
    Tables.events(spark, sfDir)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a real (file-backed) relation with a visible filter:
    // a LocalRelation constant-folds before DPP planning ever sees the
    // selective predicate, and no pruning subquery gets injected
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString
    // NB the filter must be a binary comparison against a literal: DPP's
    // isLikelySelective() heuristic rejects a bare boolean attribute
    spark.createDataFrame(Seq(
      ("purchase", "gold"), ("click", "none"), ("view", "none"),
      ("signup", "none"), ("error", "none"))).toDF("event_type", "tier")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tier") === "gold")
    // aggregate a real data column: a count-only query would read zero
    // fact bytes, and DPP's benefit estimate (prunable bytes) comes out 0
    val joined = fact.join(dim, Seq("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("value").as("v"))

    val qe = joined.queryExecution
    assert(qe.executedPlan.toString.contains("dynamicpruning"),
      qe.executedPlan.toString.take(2000))

    val rows = qe.executedPlan.executeCollect()
    val expected = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length == 1 && rows.head.getLong(1) == expected)
    assert(!rows.head.isNullAt(2))

    // runtime file-level proof: only the purchase directory was read.
    // (plain collect() stops at the AQE wrapper — its query stages hang
    // off `plan` fields, not `children` — so flatten manually)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case _ => p.children.flatMap(allNodes)
    })
    // match the fact scan only — the dim scan is also path-based and its
    // numFiles would otherwise pollute the count
    val factName = new java.io.File(dir).getName
    val factScans = allNodes(qe.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata("Location").contains(factName) => f
    }
    assert(factScans.nonEmpty, "fact scan not found in executed plan")
    val scanned = factScans.map(_.metrics("numFiles").value).sum
    assert(factScans.exists(_.metrics("pruningTime").value >= 0),
      "fact scan carries no dynamic pruning metric")
    def filesUnder(p: String) = {
      val d = new java.io.File(p)
      Option(d.listFiles()).getOrElse(Array.empty)
        .count(f => f.getName.endsWith(".parquet"))
    }
    val allFiles = Option(new java.io.File(dir).listFiles()).get
      .filter(_.isDirectory).map(d => filesUnder(d.getPath)).sum
    assert(scanned == filesUnder(s"$dir/event_type=purchase"),
      s"DPP did not bound the scan: $scanned files")
    assert(scanned < allFiles)
  }
}
