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
}
