package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

/** Salting must never change results — only partitioning. Verified on a
  * deliberately skewed dataset (one key holds 90% of rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed() = {
    // 9000 rows on hot key 1, 1000 spread over keys 2..101
    val rows = (0 until 9000).map(i => (1L, i.toDouble)) ++
      (0 until 1000).map(i => (2L + i % 100, i.toDouble))
    rows.toDF("k", "v")
  }

  private def dims() = (1L to 101L).map(k => (k, s"dim_$k")).toDF("k", "name")

  test("saltedJoin equals the plain join on skewed data") {
    val plain = skewed().join(dims(), Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    val salted = SkewOps.saltedJoin(skewed(), dims(), "k", factor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    assert(plain.sameElements(salted))
  }

  test("saltedJoin preserves left-outer semantics for unmatched probe rows") {
    val probe = Seq((1L, 1.0), (999L, 2.0)).toDF("k", "v")
    val r = SkewOps.saltedJoin(probe, dims(), "k", factor = 4, how = "left")
      .orderBy("k").collect()
    assert(r.length == 2)
    assert(r(0).getAs[String]("name") == "dim_1")
    assert(r(1).isNullAt(r(1).fieldIndex("name")))
  }

  test("saltedSumCount equals the direct aggregation") {
    val direct = skewed().groupBy("k")
      .agg(sum(col("v").cast("decimal(18,4)")).cast("double").as("sum_val"),
        count(lit(1)).as("cnt"))
      .orderBy("k").collect()
    val salted = SkewOps.saltedSumCount(skewed(), "k", "v", factor = 8)
      .orderBy("k").collect()
    assert(direct.sameElements(salted))
  }

  test("AQE skew-join splits the hot SMJ partition and matches the salted result") {
    // The mechanism SCALE.md relies on at 100 TB: Spark's own
    // adaptive skew-join must split the same hot key the manual salting
    // handles — pinned here by the `skew=true` marker in the final
    // adaptive plan AND by result equality with the salted variant.
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: the hot partition is ~6 MB of incompressible
      // hashes; production defaults (256 MB / 64 MB) shrink the same way
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // one hot key with 50k rows of incompressible payload; 100 cold keys
      val pad = concat(md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string")),
        md5((col("id") + 2).cast("string")),
        md5((col("id") + 3).cast("string")))
      val probe = spark.range(50000)
        .select(lit(1L).as("k"), (col("id") % 97).cast("double").as("v"), pad.as("pad"))
        .union(spark.range(1000)
          .select((col("id") % 100 + 2).as("k"), col("id").cast("double").as("v"),
            pad.as("pad")))
      val dims = spark.range(1, 102)
        .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))

      // execute the bare join so ITS adaptive plan finalizes, then assert
      // on that same QueryExecution (count()/agg() would each spawn a new
      // one and leave joined's plan un-finalized)
      val joined = probe.join(dims, Seq("k"))
      assert(joined.collect().length == 51000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed SMJ:\n$plan")

      val aqe = probe.join(dims, Seq("k")).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .orderBy("k").collect()

      val salted = SkewOps.saltedJoin(probe, dims, "k", factor = 8)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .orderBy("k").collect()
      assert(aqe.sameElements(salted))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("join_skew_salted spreads the hot key across salt partitions") {
    // the salted join key is (okey, __salt): distinct salt values on the
    // probe side must exceed 1, proving the hot key actually fans out
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("okey"))
      .withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
    assert(li.select("__salt").distinct().count() > 1)
  }
}
