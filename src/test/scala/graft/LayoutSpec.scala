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

  test("z-order-sorted write bounds row-group stats on BOTH filter dimensions") {
    // Single-key sort skips on one column only; sorting by the Morton
    // interleave of (l_orderkey, l_partkey) narrows row-group min/max on
    // both — the layout that makes 2-D point/range queries skip IO at
    // 100 TB. Proven here directly from the parquet footers.
    import graft.operators.AnalyticsExt.zorderKey
    val li = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val rgBytes = 32 * 1024
    val zdir = Files.createTempDirectory("graft_zorder").toString
    // normalize both dims to the same 8-bit range first — raw interleave
    // would let the wider column's high bits dominate the curve and the
    // narrow column would not be clustered at all (the standard z-order
    // writer trick; min/max here play the role of table-level stats)
    val (oMin, oMax, pMin, pMax) = {
      val r = li.agg(min("l_orderkey"), max("l_orderkey"),
        min("l_partkey"), max("l_partkey")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    def scale8(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      ((c - lit(lo)) * 255L / lit(hi - lo)).cast("long")
    li.withColumn("zkey", zorderKey(
        scale8(col("l_orderkey"), oMin, oMax),
        scale8(col("l_partkey"), pMin, pMax)))
      .sort("zkey").drop("zkey").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", rgBytes).parquet(zdir)
    val kdir = Files.createTempDirectory("graft_keysort").toString
    li.sort("l_orderkey").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", rgBytes).parquet(kdir)

    def overlap(dir: String, column: String): (Int, Int) = {
      val rs = rowGroupRanges(dir, column)
      val keys = rs.map(_._1).sorted
      val key = keys(keys.length / 2)
      (rs.count { case (lo, hi) => lo <= key && key <= hi }, rs.length)
    }
    val (zOrd, zn) = overlap(zdir, "l_orderkey")
    val (zPart, _) = overlap(zdir, "l_partkey")
    val (kOrd, kn) = overlap(kdir, "l_orderkey")
    val (kPart, _) = overlap(kdir, "l_partkey")
    assert(zn >= 4, s"want several row groups, got $zn")
    // single-key sort: perfect on its key, blind on the other dimension
    assert(kOrd <= 2, s"keysort should bound l_orderkey: $kOrd/$kn")
    assert(kPart == kn, s"keysort expected blind on l_partkey: $kPart/$kn")
    // z-order: strictly narrows BOTH dimensions
    assert(zOrd < zn, s"zorder should narrow l_orderkey: $zOrd/$zn")
    assert(zPart < zn, s"zorder should narrow l_partkey: $zPart/$zn")
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

  test("pipeline_shard_write: capped, internally sorted, range-disjoint shard files") {
    // Run the query (it writes the sharded layout as a side effect),
    // then audit the files it produced via the hidden _metadata column.
    graft.SparkEntry.queries("pipeline_shard_write")(spark, sfDir).collect()
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_shards"
    val back = spark.read.parquet(tmp)
      .select(col("_metadata.file_name").as("f"), col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val byFile = back.groupBy(_._1)
    // 1. no file exceeds the maxRecordsPerFile cap
    byFile.foreach { case (f, rows) =>
      assert(rows.length <= 100, s"$f holds ${rows.length} rows (cap 100)") }
    // 2. files cover pairwise-DISJOINT (source, doc_id) ranges — the
    //    property that lets a consumer stream shards in key order
    val ranges = byFile.map { case (f, rows) =>
      val keys = rows.map(r => (r._2, r._3)).sorted
      (f, keys.head, keys.last)
    }.toSeq.sortBy(r => r._2)
    ranges.sliding(2).foreach {
      case Seq(a, b) =>
        assert(Ordering[(String, Long)].lteq(a._3, b._2),
          s"overlapping shard ranges: ${a._1} ${a._3} vs ${b._1} ${b._2}")
      case _ =>
    }
    // 3. nothing lost in the roundtrip
    assert(back.length == Tables.t(spark, sfDir, "documents").count())
  }

  test("fan-out gate: a multi-split scan plans NO round-robin exchange") {
    // Round 15 (round-14 verdict): the single-split fan-outs must be
    // GATED on actual scan parallelism — at 100 TB a scan arrives in
    // thousands of splits and a corpus-wide repartition down to #cores
    // would be a pure loss. Compact test parquet (one split) → fan-out
    // planned; the same rows split across many files → the input frame
    // comes back untouched.
    val docs = Tables.t(spark, sfDir, "documents")
    assume(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val single = Tables.fanOutIfCompact(docs)
    assert(single.queryExecution.executedPlan.toString
      .contains("RoundRobinPartitioning"))
    val keyed = Tables.fanOutIfCompact(docs, col("doc_id"))
    assert(keyed.queryExecution.executedPlan.toString.contains("hashpartitioning"))

    val dir = Files.createTempDirectory("graft_fanout").toString
    try {
      docs.repartition(8).write.mode("overwrite").parquet(s"$dir/d.parquet")
      val old = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
      try {
        val multi = spark.read.parquet(s"$dir/d.parquet")
        assume(multi.rdd.getNumPartitions >=
          spark.sparkContext.defaultParallelism)
        val gated = Tables.fanOutIfCompact(multi)
        assert(gated eq multi) // same frame: no shuffle was added
        assert(!gated.queryExecution.executedPlan.toString
          .contains("RoundRobinPartitioning"))
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
