package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `array<float>` columns.
  *
  * The similarity-search operators are the hottest loop in the engine
  * (SURVEY.md §4.3: the higher-order-function formulation measured 12.8s on
  * sf0.1); this expression keeps the O(pairs × dim) inner loop inside
  * whole-stage codegen: each float is widened to double (exact) and the
  * products are accumulated sequentially in double — bit-identical to the
  * DuckDB oracle's `list_dot_product(list_transform(a, x->CAST(x AS DOUBLE)), …)`.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object VecFunctions {
  /** Column-API entry point for [[FloatVecDot]]. */
  def vecDot(a: Column, b: Column): Column =
    Shim.column(FloatVecDot(Shim.expression(a), Shim.expression(b)))

  /** Register `vec_dot` as a SQL function on the session (idempotent), the
    * equivalent of a `SparkSessionExtensions.injectFunction` for sessions
    * the harness builds itself. */
  def register(spark: SparkSession): Unit =
    Shim.registerFunction(spark, "vec_dot",
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1)))

  /** Register Catalyst's `BloomFilterMightContain` as SQL `might_contain`
    * (Spark ships the expression for its internal runtime-filter rewrite
    * but does not SQL-register it) — used by the explicit bloom-pruned
    * join, `RelationalExt.join_bloom_pruned`. */
  def registerMightContain(spark: SparkSession): Unit = {
    Shim.registerFunction(spark, "might_contain",
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1)))
    Shim.registerFunction(spark, "bloom_filter_agg",
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        children match {
          case Seq(c) => new BloomFilterAggregate(c)
          case Seq(c, n) => new BloomFilterAggregate(c, n)
          case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
          case _ => throw new IllegalArgumentException(
            "bloom_filter_agg takes 1-3 arguments")
        }
      })
  }
}
