package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-segmentation operators (round 11, wave 3) — the readouts a
  * product/growth team draws from the same event feed the sessionizer
  * consumes: RFM cells, engagement tiers, churn-model features, and the
  * segment-migration matrix. These are the "segmenter" half of the
  * engine's name: every key reduces the corpus to a per-entity frame in
  * ONE scan-stage aggregation, then does all classification on that
  * frame (user/customer-sized, never event-sized) with exact integer /
  * DECIMAL arithmetic only.
  *
  * Scale contract shared by all four keys:
  *  - the corpus is touched exactly once (one hash-agg exchange keyed by
  *    the entity id — map-side combinable);
  *  - rankings over the entity frame run through
  *    [[ScalableWindows.bucketedRowNumber]] (the two-level machine —
  *    no corpus-sized single-task sort, parallelism ∝ buckets);
  *  - scalar frames (corpus max date, totals, percentile thresholds)
  *    broadcast onto the entity frame — never a shuffle;
  *  - every surfaced double is either a single IEEE op over exact
  *    integers or an [[StatsExt.exactDbl]] hi/lo release of a
  *    DECIMAL(38,0) sum, so results are bit-identical cross-engine.
  */
object SegmentOps {
  import StatsExt.{exactDbl, exactDblSql}

  /** Micro-lattice (1e-6) long for events.value — exact under sum. */
  private def micro(c: Column): Column =
    (c.cast("decimal(18,6)") * 1000000).cast("long")

  /** Per-user engagement frame: one corpus agg. */
  private def userEngagement(s: SparkSession, dir: String): DataFrame =
    events(s, dir).groupBy("user_id")
      .agg(count(lit(1)).as("ne"),
        countDistinct(to_date(col("ts"))).as("days"),
        sum(micro(col("value"))).as("y"))

  val queries: Map[String, Q] = Map(

    // RFM SEGMENTATION — the canonical customer segmentation: quintile-
    // score every customer on Recency (days since last order), Frequency
    // (order count), and Monetary (lifetime spend), then map the
    // (R, F, M) cell to a named segment (champions / at_risk / ...).
    // Quintiles are INTEGER-EXACT: q = ((rank−1)·5) div n + 1 over the
    // deterministic total order (metric, custkey) — no ntile tie
    // ambiguity, no float thresholds — and each rank runs through the
    // two-level bucketed row_number (the gini machine), so the
    // customer-sized sorts stay bucket-parallel at 100 TB. Money rides
    // the DECIMAL(18,4) micro-lattice; shares release via the 2^32
    // hi/lo split.
    "seg_rfm" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val mx = o.agg(max(to_date(col("o_orderdate"))).as("mxd"))
      val per = o.groupBy(col("o_custkey").as("ck"))
        .agg(max(to_date(col("o_orderdate"))).as("last_d"),
          count(lit(1)).as("freq"),
          sum((col("o_totalprice").cast("decimal(18,4)") * 10000)
            .cast("long")).as("mon"))
        .crossJoin(broadcast(mx))
        .select(col("ck"),
          datediff(col("mxd"), col("last_d")).cast("long").as("rec"),
          col("freq"), col("mon"))
        .localCheckpoint() // shared leaf: three rank machines + the
                           // count/total scalars each re-read this frame
      val n1 = per.agg(count(lit(1)).as("nn"))
      def quint(df: DataFrame, bcol: String, out: String): DataFrame =
        ScalableWindows.bucketedRowNumber(df, Seq.empty, bcol,
            Seq(col(bcol), col("ck")))
          .withColumn(out, expr("((rn - 1) * 5) div nn + 1").cast("int"))
          .drop("rn", "__boff") // the machine's stitch column — dropped so
                                // the next quint's join can't collide
          .localCheckpoint() // cut the 3^k recompute compounding: each
                             // machine evaluates its input ~3x (bounds,
                             // offsets, final join)
      val scored = quint(quint(quint(
          per.crossJoin(broadcast(n1)).withColumn("negrec", -col("rec")),
          "negrec", "r_score").drop("negrec"),
        "freq", "f_score"), "mon", "m_score")
      val seg = scored.withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 &&
          col("m_score") >= 4, "champions")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "new_customers")
          .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .when(col("m_score") >= 4, "big_spenders")
          .when(col("f_score") >= 4, "loyal")
          .otherwise("regular"))
      val tot = per.agg(sum(col("mon").cast("decimal(38,0)")).as("tmon"))
      seg.groupBy("segment")
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("rec")).cast("double") / count(lit(1)), 6)
            .as("avg_recency_days"),
          round(sum(col("freq")).cast("double") / count(lit(1)), 6)
            .as("avg_frequency"),
          sum(col("mon").cast("decimal(38,0)")).as("monm"))
        .crossJoin(broadcast(tot))
        .select(col("segment"), col("n_customers"), col("avg_recency_days"),
          col("avg_frequency"),
          round(exactDbl("monm") / exactDbl("tmon"), 6)
            .as("monetary_share"))
        .orderBy("segment")
    }),

    // ENGAGEMENT TIERS — split users into power / core / casual by
    // where their event count falls against the p90/p50 thresholds of
    // the user distribution, then read each tier's size and its share
    // of events and value (the "how concentrated is engagement" twin of
    // agg_gini_concentration, in tier form). The exact percentile over
    // the user frame is the oracle-checkable anchor; at 100 TB the
    // thresholds swap to one mergeable approx_percentile sketch (the
    // pipeline_curriculum_stages_approx rule) — classification and
    // shares are otherwise a broadcast compare + one tier agg. Value
    // shares release via the hi/lo split (value ≥ 0 by corpus
    // contract).
    "seg_power_users" -> ((s, dir) => {
      val per = userEngagement(s, dir)
      val th = per.agg(percentile(col("ne"), lit(0.5)).as("p50"),
        percentile(col("ne"), lit(0.9)).as("p90"))
      val tot = per.agg(sum("ne").as("tne"),
        sum(col("y").cast("decimal(38,0)")).as("ty"))
      per.crossJoin(broadcast(th))
        .withColumn("tier",
          when(col("ne") >= col("p90"), "power")
            .when(col("ne") >= col("p50"), "core")
            .otherwise("casual"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n_users"),
          sum("ne").as("n_events"),
          round(sum(col("days")).cast("double") / count(lit(1)), 6)
            .as("avg_active_days"),
          sum(col("y").cast("decimal(38,0)")).as("ty_t"))
        .crossJoin(broadcast(tot))
        .select(col("tier"), col("n_users"), col("n_events"),
          round(col("n_events").cast("double") / col("tne").cast("double"),
            6).as("events_share"),
          round(exactDbl("ty_t") / exactDbl("ty"), 6).as("value_share"),
          col("avg_active_days"))
        .orderBy("tier")
    }),

    // CHURN-MODEL FEATURE FRAME — the per-user design matrix a churn
    // classifier trains on: recency, tenure, volume, breadth, intensity
    // and the 14-day-inactivity label, one row per user. This is the
    // feature-engineering shape (entity, label, features) every
    // activation/retention model consumes; the whole frame falls out of
    // ONE corpus aggregation joined with the broadcast corpus-max date.
    // Ratios are single IEEE divisions over exact longs; value_sum is
    // the dsum6 exact-decimal release.
    "seg_churn_features" -> ((s, dir) => {
      val mx = events(s, dir).agg(max(to_date(col("ts"))).as("mxd"))
      events(s, dir).groupBy("user_id")
        .agg(max(to_date(col("ts"))).as("last_d"),
          min(to_date(col("ts"))).as("first_d"),
          count(lit(1)).as("n_events"),
          countDistinct(to_date(col("ts"))).as("active_days"),
          countDistinct(col("event_type")).as("n_types"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purch"),
          dsum6(col("value")).as("value_sum"))
        .crossJoin(broadcast(mx))
        .select(col("user_id"),
          datediff(col("mxd"), col("last_d")).cast("long")
            .as("recency_days"),
          (datediff(col("last_d"), col("first_d")) + 1).cast("long")
            .as("tenure_days"),
          col("n_events"), col("active_days"), col("n_types"),
          round(col("n_purch").cast("double") / col("n_events"), 6)
            .as("purchase_ratio"),
          round(col("n_events").cast("double") / col("active_days"), 6)
            .as("events_per_active_day"),
          col("value_sum"),
          (col("last_d") <= date_sub(col("mxd"), 14)).as("churned"))
        .orderBy("user_id")
    }),

    // SEGMENT-MIGRATION MATRIX — how users MOVE between engagement
    // bands across the two corpus halves (the CUPED absolute-day split,
    // days 1–15 vs 16+): per-user event counts per half from one corpus
    // agg, fixed integer band edges (absent / light <10 / medium <50 /
    // heavy), then the |bands|² transition cell counts with shares.
    // The matrix is the retention diagnostic behind every "where did
    // the power users go" review; the plan is one exchange + a ≤16-row
    // grid.
    "seg_migration_matrix" -> ((s, dir) => {
      val dayN = datediff(to_date(col("ts")), lit("2024-01-01")) + 1
      def band(c: Column): Column =
        when(c === 0L, "absent").when(c < 10L, "light")
          .when(c < 50L, "medium").otherwise("heavy")
      val per = events(s, dir)
        .groupBy("user_id")
        .agg(sum(when(dayN <= 15, 1L).otherwise(0L)).as("npre"),
          sum(when(dayN > 15, 1L).otherwise(0L)).as("npost"))
      val tot = per.agg(count(lit(1)).as("nu"))
      per.select(band(col("npre")).as("tier_pre"),
          band(col("npost")).as("tier_post"))
        .groupBy("tier_pre", "tier_post")
        .agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(tot))
        .select(col("tier_pre"), col("tier_post"), col("n_users"),
          round(col("n_users").cast("double") / col("nu").cast("double"),
            6).as("share"))
        .orderBy("tier_pre", "tier_post")
    }))

  val oracle: Map[String, String] = Map(

    "seg_rfm" ->
      s"""WITH o AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
         |   CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
         |     AS mi FROM orders),
         | mx AS (SELECT max(d) AS mxd FROM o),
         | per AS (SELECT ck,
         |   CAST((SELECT mxd FROM mx) - max(d) AS BIGINT) AS rec,
         |   count(*) AS freq, sum(mi) AS mon FROM o GROUP BY ck),
         | n AS (SELECT count(*) AS nn FROM per),
         | sc AS (SELECT ck, rec, freq, mon,
         |   CAST((row_number() OVER (ORDER BY rec DESC, ck) - 1) * 5
         |     // (SELECT nn FROM n) + 1 AS INT) AS r_score,
         |   CAST((row_number() OVER (ORDER BY freq, ck) - 1) * 5
         |     // (SELECT nn FROM n) + 1 AS INT) AS f_score,
         |   CAST((row_number() OVER (ORDER BY mon, ck) - 1) * 5
         |     // (SELECT nn FROM n) + 1 AS INT) AS m_score
         |  FROM per),
         | seg AS (SELECT *,
         |   CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
         |     THEN 'champions'
         |    WHEN r_score >= 4 AND f_score <= 2 THEN 'new_customers'
         |    WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
         |    WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
         |    WHEN m_score >= 4 THEN 'big_spenders'
         |    WHEN f_score >= 4 THEN 'loyal'
         |    ELSE 'regular' END AS segment FROM sc),
         | tot AS (SELECT sum(CAST(mon AS HUGEINT)) AS tmon FROM per)
         |SELECT segment, count(*) AS n_customers,
         | round(CAST(sum(rec) AS DOUBLE) / count(*), 6)
         |   AS avg_recency_days,
         | round(CAST(sum(freq) AS DOUBLE) / count(*), 6) AS avg_frequency,
         | round(${exactDblSql("sum(CAST(mon AS HUGEINT))")}
         |   / ${exactDblSql("(SELECT tmon FROM tot)")}, 6)
         |   AS monetary_share
         |FROM seg GROUP BY segment ORDER BY segment""".stripMargin,

    "seg_power_users" ->
      s"""WITH per AS (SELECT user_id, count(*) AS ne,
         |   count(DISTINCT CAST(ts AS DATE)) AS days,
         |   sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
         |     AS y
         |  FROM events GROUP BY 1),
         | th AS (SELECT quantile_cont(ne, 0.5) AS p50,
         |   quantile_cont(ne, 0.9) AS p90 FROM per),
         | tiered AS (SELECT *,
         |   CASE WHEN ne >= (SELECT p90 FROM th) THEN 'power'
         |    WHEN ne >= (SELECT p50 FROM th) THEN 'core'
         |    ELSE 'casual' END AS tier FROM per),
         | tot AS (SELECT sum(ne) AS tne,
         |   sum(CAST(y AS HUGEINT)) AS ty FROM per)
         |SELECT tier, count(*) AS n_users,
         | CAST(sum(ne) AS BIGINT) AS n_events,
         | round(CAST(sum(ne) AS DOUBLE)
         |   / (SELECT CAST(tne AS DOUBLE) FROM tot), 6) AS events_share,
         | round(${exactDblSql("sum(CAST(y AS HUGEINT))")}
         |   / ${exactDblSql("(SELECT ty FROM tot)")}, 6) AS value_share,
         | round(CAST(sum(days) AS DOUBLE) / count(*), 6)
         |   AS avg_active_days
         |FROM tiered GROUP BY tier ORDER BY tier""".stripMargin,

    "seg_churn_features" ->
      s"""WITH mx AS (SELECT max(CAST(ts AS DATE)) AS mxd FROM events)
         |SELECT user_id,
         | CAST((SELECT mxd FROM mx) - max(CAST(ts AS DATE)) AS BIGINT)
         |   AS recency_days,
         | CAST(max(CAST(ts AS DATE)) - min(CAST(ts AS DATE)) + 1
         |   AS BIGINT) AS tenure_days,
         | count(*) AS n_events,
         | count(DISTINCT CAST(ts AS DATE)) AS active_days,
         | count(DISTINCT event_type) AS n_types,
         | round(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
         |   ELSE 0 END) AS DOUBLE) / count(*), 6) AS purchase_ratio,
         | round(CAST(count(*) AS DOUBLE)
         |   / count(DISTINCT CAST(ts AS DATE)), 6)
         |   AS events_per_active_day,
         | ${dsum6Sql("value")} AS value_sum,
         | (max(CAST(ts AS DATE)) <= (SELECT mxd FROM mx) - 14)
         |   AS churned
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "seg_migration_matrix" ->
      """WITH per AS (SELECT user_id,
        |   sum(CASE WHEN (CAST(ts AS DATE) - DATE '2024-01-01' + 1)
        |     <= 15 THEN 1 ELSE 0 END) AS npre,
        |   sum(CASE WHEN (CAST(ts AS DATE) - DATE '2024-01-01' + 1)
        |     > 15 THEN 1 ELSE 0 END) AS npost
        |  FROM events GROUP BY 1),
        | tot AS (SELECT count(*) AS nu FROM per),
        | bands AS (SELECT
        |   CASE WHEN npre = 0 THEN 'absent' WHEN npre < 10 THEN 'light'
        |    WHEN npre < 50 THEN 'medium' ELSE 'heavy' END AS tier_pre,
        |   CASE WHEN npost = 0 THEN 'absent' WHEN npost < 10 THEN 'light'
        |    WHEN npost < 50 THEN 'medium' ELSE 'heavy' END AS tier_post
        |  FROM per)
        |SELECT tier_pre, tier_post, count(*) AS n_users,
        | round(CAST(count(*) AS DOUBLE)
        |   / (SELECT CAST(nu AS DOUBLE) FROM tot), 6) AS share
        |FROM bands GROUP BY 1, 2 ORDER BY tier_pre, tier_post""".stripMargin)
}
