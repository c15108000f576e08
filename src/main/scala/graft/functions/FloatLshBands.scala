package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All random-hyperplane LSH band signatures of one `array<float>` vector
  * in ONE codegen'd pass: for band b, bit p is the sign of
  * ⟨vec, plane[b·bits+p]⟩, packed little-endian into an int per band.
  *
  * Exists because the compositional form — `bands × bits` separate
  * [[FloatVecDot]]-against-literal columns — grows the projection to
  * hundreds of expression nodes once `lshParams` scales the shape up
  * (9×14 at the 10× point): that plan fell out of whole-stage codegen
  * into interpreted eval and measured 13 s WARM for 20k vectors where
  * this expression does the identical arithmetic in milliseconds. Same
  * accumulation order (sequential double over float products) and same
  * `> 0` sign test as the compositional form, so signatures are
  * bit-identical — pinned by the equivalence property in the unit suite.
  *
  * `planes` rides along as one flat float[] reference object (not a
  * per-plane literal), so the generated code stays one tight loop nest
  * regardless of shape.
  */
case class FloatLshBands(child: Expression, planes: Seq[Float],
    bits: Int, bands: Int, dim: Int) extends UnaryExpression {

  require(planes.length == bands * bits * dim,
    s"planes must be bands*bits*dim floats, got ${planes.length}")

  // flat primitive copy for the hot loops; Seq stays the case-class param
  // so structural equality (canonicalization, exchange reuse) works
  @transient private lazy val flat: Array[Float] = planes.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bands expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val sigs = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var sig = 0
      var p = 0
      while (p < bits) {
        val off = (b * bits + p) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += x.getFloat(i).toDouble * flat(off + i).toDouble
          i += 1
        }
        if (acc > 0) sig |= (1 << p)
        p += 1
      }
      sigs(b) = sig
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val sigs = ctx.freshName("sigs")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $dim);
         |int[] $sigs = new int[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $sig = 0;
         |  for (int $p = 0; $p < $bits; $p++) {
         |    int $off = ($b * $bits + $p) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += (double) $x.getFloat($i) * (double) $planesRef[$off + $i];
         |    }
         |    if ($acc > 0) $sig |= (1 << $p);
         |  }
         |  $sigs[$b] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FloatLshBands =
    copy(child = newChild)
}

object FloatLshBands {
  /** Column-API entry point: all band signatures of `vec` for the given
    * plane set (row-major `Seq` of `bands*bits` planes of `dim` floats). */
  def lshBands(vec: Column, planes: Seq[Seq[Float]], bits: Int, bands: Int,
      dim: Int): Column =
    Shim.column(FloatLshBands(Shim.expression(vec),
      planes.flatten.toVector, bits, bands, dim))
}
