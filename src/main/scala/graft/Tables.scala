package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

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

  /** `events.ts` is parquet timestamp[ns], which Spark 4.x refuses to read
    * natively ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos via the legacy
    * conf and truncate to µs — bit-identical to the oracle's
    * `CAST(ts AS TIMESTAMP)` (DuckDB ns→µs cast also truncates).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
