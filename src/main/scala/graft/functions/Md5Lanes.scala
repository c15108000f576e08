package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The four independent 32-bit uniform lanes of one md5 digest, as
  * array<long>(4): lane j = digest bytes 4j..4j+3 read big-endian —
  * EXACTLY the value of `conv(substring(md5(x), 8j+1, 8), 16, 10)`,
  * because 8 hex chars of the digest string are 4 digest bytes.
  *
  * Exists because the compositional form materialized a 32-char hex
  * string per digest, sliced it four times, and round-tripped each slice
  * through conv's string-radix converter — per (event, replica) in the
  * bootstrap's hottest projection. Same digest, same integers, no
  * strings.
  */
case class Md5Lanes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_lanes expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Md5Lanes.lanesOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.functions.Md5Lanes.lanesOf($x);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Lanes =
    copy(child = newChild)
}

object Md5Lanes {

  /** md5 over the UTF-8 bytes (what Spark's `md5(string)` hashes), four
    * big-endian uint32 lanes. */
  def lanesOf(s: UTF8String): UnsafeArrayData = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes)
    val lanes = new Array[Long](4)
    var j = 0
    while (j < 4) {
      lanes(j) = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
        ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(lanes)
  }

  /** Column-API entry point. */
  def md5Lanes(s: Column): Column =
    Shim.column(Md5Lanes(Shim.expression(s)))
}
