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

/** Pure-JVM EXIF metadata extraction — the TIFF IFD walk inside a JPEG
  * APP1 segment, per the published layouts (JEITA CP-3451 / TIFF 6.0):
  *
  *   - JPEG marker scan from SOI to the APP1 (0xFFE1) segment whose
  *     payload starts "Exif\0\0"; everything after that prefix is a
  *     self-contained TIFF file.
  *   - TIFF header: byte order ("II" little / "MM" big — BOTH occur in
  *     the wild, so the walk is endian-parameterized), magic 42, offset
  *     of IFD0. All TIFF offsets are relative to the TIFF header start.
  *   - IFD: u16 entry count, then 12-byte entries (tag u16, type u16,
  *     count u32, value-or-offset u32); values ≤ 4 bytes sit inline,
  *     left-justified in file byte order.
  *   - Extracted tags: 0x0112 Orientation (SHORT, IFD0), 0x8769 Exif-IFD
  *     pointer (LONG, IFD0), and from the Exif IFD 0xA002/0xA003
  *     PixelXDimension/PixelYDimension (LONG or SHORT).
  *
  * Complements [[ImageHeaders]] (container dims) with the camera-side
  * metadata pipelines actually filter on (orientation normalization
  * before any resize). Returns null for anything unparseable — corrupt
  * payloads become null rows to filter, never job failures.
  */
object ExifHeaders {

  private def u16(b: Array[Byte], p: Int, be: Boolean): Int =
    if (be) ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    else ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)
  private def u32(b: Array[Byte], p: Int, be: Boolean): Long =
    if (be)
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    else
      ((b(p + 3) & 0xffL) << 24) | ((b(p + 2) & 0xffL) << 16) |
        ((b(p + 1) & 0xffL) << 8) | (b(p) & 0xffL)

  /** struct(endian, orientation, exif_w, exif_h) or null — called from
    * both interpreted eval and generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    var p = 2
    while (p + 3 < b.length) {
      if ((b(p) & 0xff) != 0xff) return null // desynced: not a marker
      val m = b(p + 1) & 0xff
      if (m == 0xff) p += 1 // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) p += 2 // standalone
      else if (m == 0xda) return null // SOS: image data, no APP1 found
      else {
        val segLen = u16(b, p + 2, be = true)
        if (m == 0xe1 && p + 10 <= b.length &&
          b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' && b(p + 7) == 'f' &&
          b(p + 8) == 0 && b(p + 9) == 0)
          return parseTiff(b, p + 10, math.min(b.length, p + 2 + segLen))
        p += 2 + segLen
      }
    }
    null
  }

  private def parseTiff(b: Array[Byte], t: Int, end: Int): InternalRow = {
    if (t + 8 > end) return null
    val be =
      if (b(t) == 'M' && b(t + 1) == 'M') true
      else if (b(t) == 'I' && b(t + 1) == 'I') false
      else return null
    if (u16(b, t + 2, be) != 42) return null
    val ifd0 = t + u32(b, t + 4, be)
    if (ifd0 < t || ifd0 + 2 > end) return null

    var orientation: Integer = null
    var exifPtr = -1L
    var w: Integer = null
    var h: Integer = null

    // inline (≤4-byte) values are left-justified at the value field
    def shortOrLong(typ: Int, valOff: Int): Long =
      if (typ == 3) u16(b, valOff, be).toLong else u32(b, valOff, be)

    def walk(ifd: Long)(visit: (Int, Int, Int) => Unit): Boolean = {
      val base = ifd.toInt
      if (base < t || base + 2 > end) return false
      val n = u16(b, base, be)
      if (base + 2 + n * 12 > end) return false
      var i = 0
      while (i < n) {
        val e = base + 2 + i * 12
        visit(u16(b, e, be), u16(b, e + 2, be), e + 8)
        i += 1
      }
      true
    }

    if (!walk(ifd0) { (tag, typ, valOff) =>
        if (tag == 0x0112 && typ == 3) orientation = Int.box(u16(b, valOff, be))
        else if (tag == 0x8769 && (typ == 4 || typ == 3)) exifPtr = shortOrLong(typ, valOff)
      }) return null
    if (exifPtr >= 0) {
      // a broken Exif-IFD pointer nulls the dims, not the whole row
      walk(t + exifPtr) { (tag, typ, valOff) =>
        if (tag == 0xa002 && (typ == 3 || typ == 4)) w = Int.box(shortOrLong(typ, valOff).toInt)
        else if (tag == 0xa003 && (typ == 3 || typ == 4)) h = Int.box(shortOrLong(typ, valOff).toInt)
      }
    }
    if (orientation == null && w == null && h == null) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(if (be) "MM" else "II"), orientation, w, h))
  }
}

/** `exif_meta(binary)` → struct<endian string, orientation int,
  * exif_w int, exif_h int>, null when no parseable JPEG/APP1/TIFF chain
  * exists. Static JVM call from generated code — stays inside
  * whole-stage codegen, no metadata library.
  */
case class ExifMeta(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("endian", StringType),
    StructField("orientation", IntegerType),
    StructField("exif_w", IntegerType),
    StructField("exif_h", IntegerType)))
  override def nullable: Boolean = true
  override def prettyName: String = "exif_meta"

  override def nullSafeEval(v: Any): Any =
    ExifHeaders.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.ExifHeaders.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExifFunctions {
  /** Column API for [[ExifMeta]]. */
  def exifMeta(payload: Column): Column =
    ExpressionUtils.column(ExifMeta(ExpressionUtils.expression(payload)))
}
