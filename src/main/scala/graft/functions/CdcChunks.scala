package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of one document in ONE pass: the rsync/LBFS
  * cut rule (a cut lands after character i when the md5 of the
  * `gram`-char window ending at i starts with hex nibble 0), terminal
  * boundary at the end of the doc, one (digest, clen) struct per chunk
  * where digest = md5 hex of the chunk text.
  *
  * Exists because the compositional form — `explode(sequence(gram, len))`
  * + per-position `md5(substr(...))` filter + a distinct ∪ terminal
  * union + a lag window over (doc_id, i) + a re-join against the full
  * text for the chunk digests — materialized one ROW per character
  * position through two exchanges and re-scanned the corpus for the
  * digest join (dedup_cdc_chunks' round-14 plan: 4 exchanges → 1, the
  * digest-df agg). The arithmetic here is identical: windows/chunks are
  * taken with the same 1-based inclusive character semantics as Spark's
  * `substring` (UTF8String.substringSQL), md5 is over the UTF-8 bytes of
  * exactly that substring (what Spark's `md5(string)` hashes), hex is
  * lowercase — so digests, chunk lengths and hence every downstream
  * aggregate are bit-identical to the exploded form.
  *
  * Cut positions are strictly increasing, so the former
  * `union(...).distinct()` only ever deduplicated the terminal boundary
  * against a cut landing exactly at the end — reproduced by the
  * `last != len` check.
  */
case class CdcChunks(child: Expression, gram: Int) extends UnaryExpression {

  require(gram >= 1, s"gram must be >= 1, got $gram")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("digest", StringType, nullable = false),
    StructField("clen", IntegerType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunksOf(input.asInstanceOf[UTF8String], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.functions.CdcChunks.chunksOf($x, $gram);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hexOf(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** One doc's (digest, clen) chunk array — called from both interpreted
    * and generated code. Character positions are 1-based inclusive, like
    * Spark's `substring`.
    *
    * Round 15 (per-task work, guide §1.2 step 2): the first cut scan
    * called `substringSQL(i-gram+1, gram)` per character position —
    * UTF8String re-walks char offsets from the string START each call,
    * so the per-doc loop was O(len²) in bytes plus one byte[] copy per
    * window. Both window byte offsets advance monotonically, so they are
    * now maintained INCREMENTALLY (one `numBytesForFirstByte` step each)
    * and md5 hashes the byte range in place via update(buf, off, len).
    * Byte ranges are exactly the ranges substringSQL slices (same
    * numBytesForFirstByte walk), so every digest is bit-identical. */
  def chunksOf(text: UTF8String, gram: Int): GenericArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val bytes = text.getBytes
    val nBytes = bytes.length
    // cut after position i (1-based) when md5 of chars [i-gram+1, i]
    // starts with hex nibble 0 — i.e. the digest's top 4 bits are zero
    val bounds = Array.newBuilder[Int] // cut positions, in CHARS (1-based)
    val boundOffs = Array.newBuilder[Int] // matching end BYTE offsets
    var startOff = 0 // byte offset of the window's first char
    var endOff = 0 // byte offset one past the window's last char
    var chars = 0 // chars consumed up to endOff
    var winChars = 0 // chars currently inside [startOff, endOff)
    while (endOff < nBytes) {
      endOff += UTF8String.numBytesForFirstByte(bytes(endOff))
      if (endOff > nBytes) endOff = nBytes // truncated trailing char
      chars += 1
      winChars += 1
      if (winChars > gram) {
        startOff += UTF8String.numBytesForFirstByte(bytes(startOff))
        winChars -= 1
      }
      if (winChars == gram) {
        md.reset()
        md.update(bytes, startOff, endOff - startOff)
        if ((md.digest()(0) & 0xf0) == 0) {
          bounds += chars
          boundOffs += endOff
        }
      }
    }
    val len = chars
    val cuts = bounds.result()
    val cutOffs = boundOffs.result()
    val nb = if (cuts.nonEmpty && cuts(cuts.length - 1) == len) cuts.length
             else cuts.length + 1
    val out = new Array[Any](nb)
    var prevOff = 0
    var prevChar = 0
    var j = 0
    while (j < nb) {
      val b = if (j < cuts.length) cuts(j) else len
      val bOff = if (j < cuts.length) cutOffs(j) else nBytes
      md.reset()
      md.update(bytes, prevOff, bOff - prevOff)
      out(j) = new GenericInternalRow(
        Array[Any](hexOf(md.digest()), b - prevChar))
      prevChar = b
      prevOff = bOff
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def cdcChunks(text: Column, gram: Int): Column =
    Shim.column(CdcChunks(Shim.expression(text), gram))
}
