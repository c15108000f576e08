package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** Row-local nearest-centroid assignment: the best (score, id) over a
  * BOUNDED centroid set, scored as score_j = ⟨vec, cent_j⟩ + bias_j, ties
  * to the smallest id — in ONE codegen'd pass over the centroid matrix.
  *
  * Exists because the former formulation — `crossJoin(broadcast(cent))`
  * followed by a `groupBy(vec_id).agg(max_by(...), first(embedding))` —
  * re-shuffled the ENTIRE corpus (vector payloads included) once per
  * Lloyd iteration just to compute a k-way argmax whose inputs are k
  * broadcast rows (guide §2.4: remove shuffles outright; §8: decide with
  * small rows, never move the payload for a decision). The centroid set
  * is collected by the caller behind an explicit bound (the same
  * tripwired-collect class as the MMR page and the k-means frames) and
  * rides into codegen as one flat float[] reference object, exactly like
  * [[FloatLshBands]]' plane matrix.
  *
  * Arithmetic is bit-identical to the join form: each dot is the
  * [[FloatVecDot]] loop (sequential double accumulation over
  * double-widened float products, n = min(|vec|, dim)); `+ bias`
  * reproduces `dot - cw2/2` exactly (IEEE a+(-b) ≡ a-b, bias is computed
  * once per codeword on the driver with the same fold order); the
  * comparison reproduces `max_by(id, struct(score, -id))` — strictly
  * greater score wins, equal score breaks to the smaller id — including
  * SQL's NaN-greatest total order (round 15, closing the round-14
  * ADVICE gap): a NaN score beats any finite score, NaN ties like any
  * other tie, exactly `nanSafeCompareDoubles`. On finite inputs (every
  * corpus fixture) the extra branches never fire.
  */
case class ArgMaxDot(child: Expression, cents: Seq[Float], bias: Seq[Double],
    ids: Seq[Long], dim: Int) extends UnaryExpression {

  require(ids.nonEmpty, "argmax_dot needs at least one centroid")
  require(cents.length == ids.length * dim,
    s"cents must be k*dim floats, got ${cents.length} for k=${ids.length} dim=$dim")
  require(bias.length == ids.length,
    s"bias must be one double per centroid, got ${bias.length} for k=${ids.length}")

  // flat primitive copies for the hot loop; Seqs stay the case-class
  // params so structural equality (canonicalization) works
  @transient private lazy val flatC: Array[Float] = cents.toArray
  @transient private lazy val flatB: Array[Double] = bias.toArray
  @transient private lazy val flatI: Array[Long] = ids.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmax_dot expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val k = flatI.length
    var bestS = 0.0
    var bestId = 0L
    var j = 0
    while (j < k) {
      var acc = 0.0
      var i = 0
      val off = j * dim
      while (i < n) {
        acc += x.getFloat(i).toDouble * flatC(off + i).toDouble
        i += 1
      }
      val s = acc + flatB(j)
      // nanSafeCompareDoubles order: NaN > any non-NaN, NaN == NaN
      val sNaN = java.lang.Double.isNaN(s)
      val bNaN = java.lang.Double.isNaN(bestS)
      val gt = s > bestS || (sNaN && !bNaN)
      val eq = s == bestS || (sNaN && bNaN)
      if (j == 0 || gt || (eq && flatI(j) < bestId)) {
        bestS = s
        bestId = flatI(j)
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestS, bestId))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("amdCents", flatC, "float[]")
    val bRef = ctx.addReferenceObj("amdBias", flatB, "double[]")
    val iRef = ctx.addReferenceObj("amdIds", flatI, "long[]")
    val k = flatI.length
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val bestS = ctx.freshName("bestS")
      val bestId = ctx.freshName("bestId")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $dim);
         |double $bestS = 0.0;
         |long $bestId = 0L;
         |for (int $j = 0; $j < $k; $j++) {
         |  int $off = $j * $dim;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $x.getFloat($i) * (double) $cRef[$off + $i];
         |  }
         |  double $s = $acc + $bRef[$j];
         |  // nanSafeCompareDoubles order: NaN > any non-NaN, NaN == NaN
         |  boolean ${s}NaN = java.lang.Double.isNaN($s);
         |  boolean ${bestS}NaN = java.lang.Double.isNaN($bestS);
         |  boolean ${s}Gt = $s > $bestS || (${s}NaN && !${bestS}NaN);
         |  boolean ${s}Eq = $s == $bestS || (${s}NaN && ${bestS}NaN);
         |  if ($j == 0 || ${s}Gt || (${s}Eq && $iRef[$j] < $bestId)) {
         |    $bestS = $s;
         |    $bestId = $iRef[$j];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[]{$bestS, $bestId});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArgMaxDot =
    copy(child = newChild)
}

object ArgMaxDot {
  /** Column-API entry point: best struct(d, id) of `vec` against the
    * bounded centroid set `(id, centroid, bias)` — score = dot + bias,
    * ties to the smallest id. All centroids must share one dimension. */
  def nearest(vec: Column, cents: Seq[(Long, Array[Float], Double)]): Column = {
    require(cents.nonEmpty, "argmax_dot needs at least one centroid")
    val dim = cents.head._2.length
    require(cents.forall(_._2.length == dim),
      s"ragged centroid set: dims ${cents.map(_._2.length).distinct}")
    Shim.column(ArgMaxDot(Shim.expression(vec),
      cents.flatMap(_._2.toSeq).toVector,
      cents.map(_._3).toVector, cents.map(_._1).toVector, dim))
  }
}
