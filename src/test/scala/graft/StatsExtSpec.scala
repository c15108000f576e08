package graft

import org.apache.spark.sql.functions._

/** Driver-side replays of the StatsExt recurrences — the same style of
  * non-vacuous pin as OperatorSmokeSpec's ts_holt replay: collect the
  * small inputs, recompute the statistic in plain Scala, compare to the
  * engine's released values. The DuckDB oracle is the cross-engine
  * gate; these pin the MATH (rank-tie handling, BH step-up, SPRT
  * boundaries) against an independent implementation.
  */
class StatsExtSpec extends SparkSpec {

  test("agg_spearman_corr matches a driver-side tie-corrected replay") {
    val got = SparkEntry.queries("agg_spearman_corr")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def avgRanks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.size) }
    }
    val ref = rows.groupBy(_._1).map { case (t, es) =>
      // valuesIterator, NOT .map on the Map — a pair-valued map over a
      // Map would re-key by x and silently drop tied users
      val perUser = es.groupBy(_._2).valuesIterator
        .map(us => (us.size.toLong, us.map(_._3).sum)).toSeq
      val rx = avgRanks(perUser.map(_._1))
      val ry = avgRanks(perUser.map(_._2))
      val pairs = perUser.map { case (x, y) => (rx(x), ry(y)) }
      val n = pairs.size
      val mx = pairs.map(_._1).sum / n
      val my = pairs.map(_._2).sum / n
      val cov = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
      val vx = pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum
      val vy = pairs.map(p => (p._2 - my) * (p._2 - my)).sum
      t -> cov / math.sqrt(vx * vy)
    }
    got.foreach { case (t, rho) =>
      assert(math.abs(rho - ref(t)) < 2e-6,
        s"$t: engine $rho vs replay ${ref(t)}")
    }
  }

  test("agg_bh_fdr adjusted p-values and rejections replay the step-up") {
    val rows = SparkEntry.queries("agg_bh_fdr")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    val m = rows.length
    val byP = rows.sortBy(r => (r._2, r._1)) // k ties break by type name
    // step-up: largest i with p_(i) <= i*q/m at q = 0.10, exact ints
    val imax = (1 to m).filter(i => m * (byP(i - 1)._2 + 1) <= 20L * i)
      .lastOption.getOrElse(0)
    byP.zipWithIndex.foreach { case ((t, k, pRaw, pAdj, rej), i0) =>
      val i = i0 + 1
      assert(pRaw == (k + 1).toDouble / 200.0, s"$t p_raw")
      val adj = (i to m)
        .map(j => m.toDouble * (byP(j - 1)._2 + 1) / (200.0 * j)).min
      assert(pAdj == math.min(1.0, adj), s"$t p_adj: $pAdj vs $adj")
      assert(rej == (i <= imax), s"$t rejected flag")
    }
  }

  test("agg_sprt_sequential recomputes bit-exactly from (n_cum, k_cum)") {
    val c1 = math.log(0.22 / 0.18)
    val c2 = math.log(0.78 / 0.82)
    val a = math.log(0.95 / 0.05)
    val b = math.log(0.05 / 0.95)
    val rows = SparkEntry.queries("agg_sprt_sequential")(spark, sfDir)
      .collect()
    var prevN = 0L
    rows.foreach { r =>
      val (n, k) = (r.getLong(1), r.getLong(2))
      assert(n > prevN, "n_cum strictly increases"); prevN = n
      val llr = k.toDouble * c1 + (n - k).toDouble * c2
      assert(r.getDouble(3) == math.rint(llr * 1e6) / 1e6 ||
        math.abs(r.getDouble(3) - llr) < 1e-6, s"llr at $n")
      val want = if (llr >= a) "accept_h1"
        else if (llr <= b) "accept_h0" else "continue"
      assert(r.getString(4) == want, s"decision at $n")
    }
  }

  test("agg_permutation_test: p bounds and observed diff reconcile") {
    val r = SparkEntry.queries("agg_permutation_test")(spark, sfDir)
      .collect().head
    val (nUsers, nReps, obsDiff, nExtreme, p) =
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4))
    assert(nReps == 199 && nExtreme >= 0 && nExtreme <= 199)
    assert(p == (nExtreme + 1).toDouble / 200.0 && p > 0 && p <= 1.0)
    // observed diff = mean_A - mean_B of per-user micro totals under the
    // r = 0 salt, replayed with the engine's own md5 arm rule
    val u = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(sum((col("value").cast("decimal(18,6)") * 1000000)
        .cast("long")).as("y"))
      .withColumn("arm",
        substring(md5(concat(lit("perm42:0:"),
          col("user_id").cast("string"))), 1, 1) < "8")
      .collect().map(r2 => (r2.getBoolean(2), r2.getLong(1)))
    assert(u.length.toLong == nUsers)
    val (as, bs) = u.partition(_._1)
    val want = (as.map(_._2).sum.toDouble / as.size
      - bs.map(_._2).sum.toDouble / bs.size) / 1e6
    assert(math.abs(obsDiff - want) < 2e-6, s"$obsDiff vs $want")
  }
}
