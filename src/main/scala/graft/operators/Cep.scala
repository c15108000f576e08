package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared CEP pattern template: a STRICTLY-CONSECUTIVE sequence of event
  * types that must complete within `windowMicros` of its first step —
  * the MATCH_RECOGNIZE / Flink-CEP "funnel regex lite" contract that
  * `ts_pattern_detect` has always pinned, factored out so the batch
  * detector (lead-window formulation) and the streaming DFA
  * ([[graft.streaming.StreamingPattern]]) consume ONE definition and can
  * never drift.
  *
  * The template length bounds both formulations: batch takes
  * `steps.length − 1` leads over one user-keyed window (a single
  * exchange regardless of template size); streaming keeps exactly
  * `steps.length − 1` (type, ts) slots per key, however long the stream
  * runs — O(template) state, the property that makes fixed-sequence CEP
  * streaming-native.
  */
case class CepTemplate(steps: Seq[String], windowMicros: Long) {
  require(steps.length >= 2, "a pattern needs at least two steps")
}

object Cep {

  /** The classic purchase-funnel triple, 24 h — the template the original
    * `ts_pattern_detect` hard-coded (3 steps → 2 streaming slots). */
  val ViewClickPurchase: CepTemplate =
    CepTemplate(Seq("view", "click", "purchase"), 24L * 3600 * 1000000)

  /** Activation pattern: signup immediately followed by purchase within
    * 12 h (2 steps → 1 streaming slot) — the second template both modes
    * exercise, chosen to cover the minimum-length DFA. */
  val SignupPurchase: CepTemplate =
    CepTemplate(Seq("signup", "purchase"), 12L * 3600 * 1000000)

  /** Batch detector: per user, count of strictly-consecutive matches of
    * `tpl` completing within its window; users with zero matches drop.
    * `steps.length − 1` leads over the same (ts, event_id) total order =
    * ONE user-key exchange; the pattern predicate is a row-local
    * conjunction and the µs gap test is exact integer arithmetic. */
  def detectBatch(ev: DataFrame, tpl: CepTemplate): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val n = tpl.steps.length
    val withLeads = (1 until n).foldLeft(ev) { (d, i) =>
      d.withColumn(s"t$i", lead(col("event_type"), i).over(w))
    }.withColumn("ts_last", lead(col("ts"), n - 1).over(w))
    val cond = tpl.steps.zipWithIndex.map { case (step, i) =>
      (if (i == 0) col("event_type") else col(s"t$i")) === step
    }.reduce(_ && _) &&
      unix_micros(col("ts_last")) - unix_micros(col("ts")) <= tpl.windowMicros
    withLeads.groupBy("user_id")
      .agg(count(when(cond, 1)).as("n_patterns"))
      .filter(col("n_patterns") > 0)
      .orderBy("user_id")
  }

  /** DuckDB twin of [[detectBatch]] over the standard events view —
    * generated from the SAME template object, so the oracle can't drift
    * from the Spark formulation either. */
  def detectSql(tpl: CepTemplate): String = {
    val n = tpl.steps.length
    val leadCols = (1 until n).map(i =>
      s"    lead(event_type, $i) OVER w AS t$i,").mkString("\n")
    val conds = tpl.steps.zipWithIndex.map { case (step, i) =>
      (if (i == 0) "event_type" else s"t$i") + s" = '$step'"
    }.mkString("\n   AND ")
    s"""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
       |  FROM events),
       | l AS (SELECT user_id, event_type, ts,
       |$leadCols
       |    lead(ts, ${n - 1}) OVER w AS ts_last
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, count(*) FILTER (WHERE $conds
       |   AND epoch_us(ts_last) - epoch_us(ts) <= ${tpl.windowMicros}) AS n_patterns
       |FROM l GROUP BY 1 HAVING n_patterns > 0 ORDER BY 1""".stripMargin
  }
}
