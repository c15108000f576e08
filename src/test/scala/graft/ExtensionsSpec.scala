package graft

import graft.plans.{GraftExtensions, LevenshteinPrefilter}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** Session-extension surface: the Levenshtein pre-filter optimizer rule
  * (result-preserving, idempotent, visible in the optimized plan) and the
  * `GraftExtensions` wiring class.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ LevenshteinPrefilter
    try body finally spark.experimental.extraOptimizations = prev
  }

  // Parquet-backed input: a LocalRelation would be constant-folded away
  // before the optimized plan could be inspected.
  private def pairs = Tables.t(spark, sfDir, "part")
    .select(col("p_name").as("a"), col("p_brand").as("b"))

  test("rule injects a length guard ahead of levenshtein <= k") {
    val expected = pairs.filter(levenshtein(col("a"), col("b")) <= 6).collect().toSet
    withRule {
      val df = pairs.filter(levenshtein(col("a"), col("b")) <= 6)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein"), opt)
      assert(opt.contains("abs((length("), opt)
      // results are unchanged by the guard
      assert(df.collect().toSet == expected)
    }
  }

  test("rule is idempotent: second application adds no duplicate guard") {
    withRule {
      val df = pairs.filter(levenshtein(col("a"), col("b")) <= 6)
      val once = df.queryExecution.optimizedPlan
      val twice = LevenshteinPrefilter(once)
      assert(twice.fastEquals(once), s"rule not idempotent:\n$twice\nvs\n$once")
    }
  }

  test("rule leaves unrelated filters and pre-guarded conjuncts alone") {
    withRule {
      val plain = pairs.filter(length(col("a")) > 2)
      assert(!plain.queryExecution.optimizedPlan.toString.contains("levenshtein"))
      // manually guarded: the rule must not add a second copy
      val guarded = pairs
        .filter(abs(length(col("a")) - length(col("b"))) <= 6
          && levenshtein(col("a"), col("b")) <= 6)
      val opt = guarded.queryExecution.optimizedPlan.toString
      assert("abs\\(".r.findAllIn(opt).size == 1, opt)
    }
  }

  test("GraftExtensions wires the rule and vec_dot into a session builder") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(org.apache.spark.sql.graftshim.Shim.optimizerRules(spark, ext)
      .contains(LevenshteinPrefilter))
    // the same vec_dot builder is SQL-callable once registered on a session
    graft.functions.VecFunctions.register(spark)
    val d = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head.getDouble(0)
    assert(d == 11.0)
  }
}
