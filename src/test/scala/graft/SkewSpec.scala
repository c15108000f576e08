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
