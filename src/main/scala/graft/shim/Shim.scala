/*
 * Bridge into Spark's `private[sql]` surface from library code.
 *
 * Spark 4.x wraps `Column` around a `ColumnNode` rather than a Catalyst
 * `Expression`; the public API intentionally hides the conversion. Living in
 * a subpackage of `org.apache.spark.sql` grants access to the `private[sql]`
 * helpers (`classic.ExpressionUtils`, `SparkSession.sessionState`) — the
 * same technique widely used by open-source Spark extensions (e.g. Delta,
 * Iceberg runtime shims).
 */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

object Shim {
  /** Wrap a raw Catalyst Expression as a user-facing Column (Spark 4.x). */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Expose the `private[sql]` rule list of a SparkSessionExtensions —
    * test-only introspection of what an extensions class injected. */
  def optimizerRules(spark: SparkSession, ext: org.apache.spark.sql.SparkSessionExtensions)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)

  /** Unwrap a Column back to its Catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as an executable DataFrame — test-only plan
    * introspection (e.g. counting a WindowExec child's rows/partition
    * cardinality in the PlanSpec parallelism sweeps). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a Catalyst expression builder as a SQL function on this
    * session (idempotent). Mirrors what a `SparkSessionExtensions`
    * `injectFunction` does at session build time; done here at first use
    * because the verify/bench harness builds the session itself. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val registry = classic.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo("graft", name),
        builder)
    }
  }
}
