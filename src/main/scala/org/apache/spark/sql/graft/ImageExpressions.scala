/* Lives under org.apache.spark.sql for the same reason as
 * VectorExpressions: the private[sql] extension points (AbstractDataType,
 * classic.ExpressionUtils) are needed for a native expression. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image container header parsing — no codec library, just the
  * published container layouts:
  *
  *   - PNG: 8-byte signature, then the IHDR chunk is mandatory-first —
  *     width/height are the two big-endian u32 at bytes 16..23
  *     (PNG spec §11.2.2 / RFC 2083).
  *   - JPEG: marker scan from SOI, skipping variable-length segments by
  *     their big-endian u16 lengths until a frame header SOFn
  *     (0xC0–0xCF minus DHT/JPG/DAC 0xC4/0xC8/0xCC); height/width are
  *     the u16s at SOFn payload bytes 3..6 (ITU-T T.81 §B.2.2).
  *   - GIF: 6-byte version signature, then the logical screen descriptor's
  *     LITTLE-endian u16 width/height (GIF89a spec §18).
  *
  * Used by [[ImageMeta]]; returns null for anything it cannot parse
  * (truncated or not one of the three formats) — corrupt payloads become
  * null metadata rows to filter, never job failures.
  */
object ImageHeaders {

  private def u16be(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u16le(b: Array[Byte], p: Int): Int =
    ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)
  private def i32be(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** (format, width, height) as an InternalRow, or null if unparseable —
    * called from both interpreted eval and generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    if (b.length >= 24 && b.startsWith(PngSig) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      return row("png", i32be(b, 16), i32be(b, 20))
    }
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      return row("gif", u16le(b, 6), u16le(b, 8))
    }
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // marker scan: p sits on a 0xFF marker byte
      var p = 2
      while (p + 3 < b.length) {
        if ((b(p) & 0xff) != 0xff) return null // desynced: not a marker
        val m = b(p + 1) & 0xff
        if (m == 0xff) p += 1 // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) p += 2 // standalone, no length
        else if (isSof(m)) {
          // segment: FF m len(2) precision(1) height(2) width(2)
          return if (p + 8 < b.length) row("jpeg", u16be(b, p + 7), u16be(b, p + 5)) else null
        } else p += 2 + u16be(b, p + 2) // skip segment by its length
      }
      return null
    }
    null
  }

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))
}

/** `image_meta(binary)` → struct<format string, width int, height int>,
  * null when the payload is not a parseable PNG/JPEG/GIF header. The
  * parse is a static JVM call from generated code — stays inside
  * whole-stage codegen, no UDF serialization, no codec dependency.
  */
case class ImageMeta(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"

  override def nullSafeEval(v: Any): Any =
    ImageHeaders.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.ImageHeaders.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageFunctions {
  /** Column API for [[ImageMeta]]. */
  def imageMeta(payload: Column): Column =
    ExpressionUtils.column(ImageMeta(ExpressionUtils.expression(payload)))
}
