package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders + cross-engine determinism helpers.
  *
  * Every query result that the driver hash-compares against the DuckDB
  * oracle must be value-deterministic across engines. Two rules applied
  * throughout (SURVEY.md §5.2):
  *  - float SUMs go through an exact DECIMAL accumulator and come back as
  *    DOUBLE (`dsum`) — summation order then cannot matter;
  *  - order-insensitive float aggregates (avg/stddev/corr/percentile) are
  *    rounded to a precision far above their accumulation error.
  */
object Tables {
  type Q = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Round-robin fan-out for SINGLE-SPLIT scans only (round 15, gating
    * the round-14 unconditional repartitions — guide §2.6 vs §2.4): the
    * compact test parquet arrives as ONE scan split, so a key whose
    * expensive per-row work lives in the scan stage ran it on one core;
    * a production corpus arrives in thousands of splits and must NOT pay
    * a corpus-wide shuffle down to #cores partitions for zero benefit.
    * The gate reads the frame's actual scan parallelism (no job runs —
    * partition math only) and repartitions only when it is below the
    * session default. Optional `keys` keep the round-14 keyed variant
    * (deterministic per-doc placement) where a consumer relied on it. */
  def fanOutIfCompact(df: DataFrame, keys: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else if (keys.isEmpty) df.repartition(p)
    else df.repartition(p, keys: _*)
  }

  /** Schema-adaptive `ts` normalization. The driver's testdata has shipped
    * `events.ts` in two encodings across regens:
    *  - parquet timestamp[ns], which Spark 4.x refuses to read natively
    *    ([PARQUET_TYPE_ILLEGAL]) — under `nanosAsLong=true` it resolves as
    *    raw-nanos LongType, which we truncate to µs;
    *  - parquet timestamp[us] (no tz), which resolves natively as
    *    TIMESTAMP_NTZ — cast to TIMESTAMP (same instant under the UTC
    *    session timezone used everywhere in this engine).
    * Both paths are bit-identical to the oracle's `CAST(ts AS TIMESTAMP)`
    * (DuckDB's ns→µs cast also truncates). Branching on the *resolved*
    * type makes the read immune to further encoding drift.
    */
  def normalizeTs(df: DataFrame, name: String = "ts"): DataFrame =
    df.schema(name).dataType match {
      case LongType         => df.withColumn(name, timestamp_micros(expr(s"`$name` div 1000")))
      case _: TimestampNTZType => df.withColumn(name, col(name).cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.`$name` resolved as unsupported type $other")
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    // Keep the legacy conf set so ns-encoded data still resolves (as Long).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(spark, dir, "events"))
  }

  /** Exact float sum: accumulate in DECIMAL(18,4) (associative, exact),
    * surface as DOUBLE. Oracle twin:
    * `CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Same with 6 fractional digits for small-magnitude values (events.value). */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Oracle-side SQL fragment matching [[dsum]]. */
  def dsumSql(x: String): String = s"CAST(sum(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def dsum6Sql(x: String): String = s"CAST(sum(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"
}
