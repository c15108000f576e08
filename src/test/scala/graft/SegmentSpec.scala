package graft

import org.apache.spark.sql.functions._

/** Non-vacuous pins for the segmentation family's driver-side integer
  * machines (the adamicAdar-fixture rule: the oracle proves cross-engine
  * equality, these prove the ALGORITHM — an independent plain-Scala
  * replay from the raw rows must reproduce the query's output).
  */
class SegmentSpec extends SparkSpec {

  test("seg_kmeans_behavior matches a plain-Scala replay of the integer Lloyd rounds") {
    val feats = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("f1"),
        (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) * 10L)
          .as("f2"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val lo1 = feats.map(_._1).min; val hi1 = feats.map(_._1).max
    val lo2 = feats.map(_._2).min; val hi2 = feats.map(_._2).max
    var cents = (1 to 4).map(i =>
      (lo1 + (hi1 - lo1) * (2 * i - 1) / 8,
        lo2 + (hi2 - lo2) * (2 * i - 1) / 8)).toArray
    def assign(f: (Long, Long)): Int = {
      val d = cents.map { case (c1, c2) =>
        (f._1 - c1) * (f._1 - c1) + (f._2 - c2) * (f._2 - c2) }
      // ties to the LOWEST cluster id (the <= chain in the query)
      d.zipWithIndex.minBy { case (dist, i) => (dist, i) }._2
    }
    for (_ <- 1 to 3) {
      val byC = feats.groupBy(assign)
      cents = cents.zipWithIndex.map { case (old, i) =>
        byC.get(i) match {
          case Some(m) if m.nonEmpty =>
            (m.map(_._1).sum / m.length, m.map(_._2).sum / m.length)
          case _ => old
        }
      }
    }
    val expected = feats.groupBy(assign).map { case (i, m) =>
      (i + 1) -> ((m.length.toLong, cents(i)._1, cents(i)._2))
    }
    val got = SparkEntry.queries("seg_kmeans_behavior")(spark, sfDir)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("ts_markov_steady matches a plain-Scala replay of the fixed-point iteration") {
    // independent pair extraction (sort-in-memory, no window) + the
    // same 12-step integer recurrence
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map { r =>
        val ts = r.getTimestamp(1)
        // full-microsecond instant — the query's window orders by the
        // µs-precision ts, so a millisecond-truncated sort key could
        // order a same-millisecond pair differently
        val micros = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
        (r.getLong(0), micros, r.getLong(2), r.getString(3))
      }
    val pairs = evs.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(t => (t._2, t._3)).map(_._4)
      sorted.zip(sorted.tail)
    }.toSeq
    val counts = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rowTot = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val pm = counts.map { case ((i, j), c) => (i, j, 1000000L * c / rowTot(i)) }
    val states = (pm.map(_._1) ++ pm.map(_._2)).toSeq.distinct.sorted
    var v = states.map(_ -> 1000000L / states.length).toMap
    for (_ <- 1 to 12) {
      val nv = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      pm.foreach { case (i, j, p) => nv(j) += v.getOrElse(i, 0L) * p }
      v = nv.iterator.map { case (st, acc) => st -> acc / 1000000L }.toMap
    }
    val got = SparkEntry.queries("ts_markov_steady")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == v, s"got=$got expected=$v")
    // fixed-point mass stays within k truncation units of 1e6 per step
    assert(math.abs(got.values.sum - 1000000L) <= 12L * (states.size + 1))
  }

  test("seg_rfm quintiles are integer-exact against a sorted-replay of each metric") {
    val per = Tables.t(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(max(to_date(col("o_orderdate"))).as("last_d"),
        count(lit(1)).as("freq"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    val n = per.length
    // frequency quintile via the ((rank-1)*5) div n + 1 contract
    val fRank = per.sortBy(t => (t._3, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> ((i.toLong * 5) / n + 1) }.toMap
    val seg = per.map { case (ck, _, freq) => (ck, fRank(ck), freq) }
    // quintile sizes balanced within 1 and monotone in the metric
    val sizes = seg.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet == (1L to 5L).toSet, sizes)
    assert(sizes.values.max - sizes.values.min <= 1, sizes)
    val byQ = seg.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    for (q <- 1L to 4L)
      assert(byQ(q).max <= byQ(q + 1).min ||
        byQ(q).max == byQ(q + 1).min, // boundary tie split by custkey
        s"quintile $q not monotone")
  }
}
