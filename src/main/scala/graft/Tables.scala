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
