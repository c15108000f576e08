package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst ADC score: Σ_sub lut[sub·k + codes(sub)] over a PQ
  * codes column (`array<int>`, one codeword id per subspace) and a
  * per-query flat lookup table (`array<double>`, length m·k).
  *
  * This is the inner loop of the compressed-domain corpus scan
  * (`sim_pq_knn` / `sim_ivfpq_knn`): at scale it executes once per
  * (query, corpus vector), so it must stay inside whole-stage codegen —
  * the equivalent higher-order-function formulation
  * (`aggregate(zip_with(...), element_at(map, ...))`) drops the scan out
  * of codegen into interpreted eval, the same cliff SCALE.md §10 records
  * for the LSH signature projection. Accumulation is sequential in
  * subspace order, bit-identical to the HOF form it replaces.
  *
  * Out-of-range indices contribute nothing (guarded) — they cannot occur
  * for codes produced by `pqEncode` against the same codebook layout,
  * but a mismatched (codes, lut) pairing must not crash the scan.
  */
case class PqAdcScore(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) if k > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (array<int>, array<double>) with k > 0, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString}, k=$k)")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = lut.numElements()
    var acc = 0.0
    var i = 0
    while (i < m) {
      val idx = i * k + codes.getInt(i)
      if (idx >= 0 && idx < n) acc += lut.getDouble(idx)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |int $n = $lut.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  int $idx = $i * $k + $codes.getInt($i);
         |  if ($idx >= 0 && $idx < $n) $acc += $lut.getDouble($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  /** Column-API entry point. `codes` is `array<int>` (length m), `lut`
    * the query's flat m·k `array<double>` partial-dot table. */
  def adcScore(codes: Column, lut: Column, k: Int): Column =
    Shim.column(PqAdcScore(Shim.expression(codes), Shim.expression(lut), k))
}
