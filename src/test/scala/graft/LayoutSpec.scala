package graft

import java.nio.file.Files
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Physical-layout levers beyond partitioning/bucketing: key-sorted files
  * (min/max data skipping — the poor man's z-order) and target-sized
  * output files (the small-files problem).
  *
  * At 100 TB these decide how much of the corpus a point query touches:
  * a sort-on-write keeps each row group's key range narrow, so parquet
  * min/max stats exclude almost every group; unsorted, every group
  * overlaps every predicate and stats prune nothing.
  */
class LayoutSpec extends SparkSpec {

  private def rowGroupRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = new Configuration()
    val files = Option(new java.io.File(dir).listFiles()).get
      .filter(_.getName.endsWith(".parquet"))
    files.toSeq.flatMap { f =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.getPath), conf))
      try rd.getFooter.getBlocks.asScala.toSeq.map { b =>
        val c = b.getColumns.asScala
          .find(_.getPath.toDotString == column).get
        val st = c.getStatistics
        (st.genericGetMin.asInstanceOf[Number].longValue,
          st.genericGetMax.asInstanceOf[Number].longValue)
      } finally rd.close()
    }
  }

  test("key-sorted write yields disjoint row-group stats that skip point lookups") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val sorted = Files.createTempDirectory("graft_sorted").toString
    val unsorted = Files.createTempDirectory("graft_unsorted").toString
    // small row groups so even sf0.001 produces several per file
    val rgBytes = 64 * 1024
    li.sort("l_orderkey").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", rgBytes).parquet(sorted)
    li.sortWithinPartitions(rand(7)).coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", rgBytes).parquet(unsorted)

    val sortedRanges = rowGroupRanges(sorted, "l_orderkey")
    val unsortedRanges = rowGroupRanges(unsorted, "l_orderkey")
    assert(sortedRanges.length >= 3, s"want several row groups, got $sortedRanges")

    // a point predicate on the key overlaps exactly one sorted group but
    // (almost) every unsorted one — that ratio IS the IO saving
    val key = sortedRanges(sortedRanges.length / 2)._1
    def overlapping(rs: Seq[(Long, Long)]) = rs.count { case (lo, hi) => lo <= key && key <= hi }
    assert(overlapping(sortedRanges) <= 2,
      s"sorted layout should bound overlap: $sortedRanges")
    assert(overlapping(unsortedRanges) == unsortedRanges.length,
      s"random layout should overlap everywhere: $unsortedRanges")

    // and the engine still answers identically off both layouts, with the
    // predicate pushed to the scan
    val q = spark.read.parquet(sorted).filter(col("l_orderkey") === key)
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters"))
    assert(q.count() == spark.read.parquet(unsorted)
      .filter(col("l_orderkey") === key).count())
  }

  test("compacting writer hits a target file size instead of shipping shuffle shrapnel") {
    val ev = Tables.events(spark, sfDir)
    // the anti-pattern: one output file per shuffle partition
    val shards = Files.createTempDirectory("graft_shards").toString
    // round-robin: sf0.001 has only 15 distinct users, so hash-partitioning
    // by user would leave empty partitions (which write no file at all)
    ev.repartition(16).write.mode("overwrite").parquet(shards)
    def parquetFiles(p: String) = Option(new java.io.File(p).listFiles()).get
      .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(shards).length == 16)

    // size-aware compaction: estimate bytes from the optimized plan's
    // stats, choose ceil(size/target) files
    val targetBytes = 128 * 1024L
    val estBytes = ev.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val nFiles = math.max(1, math.ceil(estBytes.toDouble / targetBytes).toInt)
    val compact = Files.createTempDirectory("graft_compact").toString
    ev.repartition(nFiles).write.mode("overwrite").parquet(compact)

    val files = parquetFiles(compact)
    assert(files.length == nFiles, s"wanted $nFiles files, got ${files.length}")
    // all files within ~2.5x of target (plan stats over-estimate vs
    // snappy-compressed parquet, so the real guard is the upper bound)
    assert(files.forall(_.length <= (2.5 * targetBytes).toLong),
      files.map(_.length).mkString(","))
    assert(spark.read.parquet(compact).count() == ev.count())
  }
}
