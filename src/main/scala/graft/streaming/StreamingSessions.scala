package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.8 streaming operators (Structured Streaming): the incremental twins
  * of the batch sessionization/window operators in
  * [[graft.operators.Sessionization]]. Each takes any streaming (or
  * batch) events DataFrame with columns (event_id, user_id, ts, value,
  * event_type, …).
  *
  * Output-mode mapping from the reference's Kafka-Streams semantics:
  * continuous session *updates* ≈ Update mode; suppress-until-window-close
  * (emit final sessions only) ≈ Append mode after the watermark — the
  * demo's emit-final behavior, used here.
  */
object StreamingSessions {

  /** Gap-based sessionization with watermark; Append-mode compatible
    * (sessions emit once the watermark passes session end). */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Tumbling-window aggregation with watermark (Append-compatible). */
  def tumbling(events: DataFrame, width: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), window(col("ts"), width).as("w"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("w.start").as("w_start"),
        col("n_events"), col("sum_value"))

  /** Sliding-window aggregation with watermark (Append-compatible): each
    * event lands in ⌈width/slide⌉ overlapping windows. */
  def sliding(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("w.start").as("w_start"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup on event_id, state bounded by the watermark. */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream⋈static dimension join (KStream⋈GlobalKTable analog). */
  def enrichWithCustomer(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(customer, events("user_id") === customer("c_custkey"), "inner")

  /** Windowed stream⋈stream self-join (KStream.join(JoinWindows) analog):
    * purchase events matched to clicks by the same user within the
    * preceding hour. Both sides need watermarks for state cleanup. */
  def purchaseClickJoin(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    p.join(c, expr(
      "p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts < p_ts"))
  }

  /** Parquet-backed streaming source over the events table (the no-Kafka
    * replay source for this zero-egress environment). `ts` arrives as raw
    * nanos (LongType) and is truncated to µs exactly like the batch path. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // File-stream sources require a directory or glob, not a bare file.
    spark.readStream.schema(rawSchema).parquet(s"$dir/events*")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
