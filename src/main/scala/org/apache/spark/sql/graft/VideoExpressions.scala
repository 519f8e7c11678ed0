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

/** Pure-JVM video container header parsing — no codec library, just the
  * published ISO BMFF (MP4) box layout (ISO/IEC 14496-12):
  *
  *   - a file is a sequence of boxes: big-endian u32 size + 4-char type
  *     (size 1 = 64-bit largesize follows; size 0 = to end of file);
  *   - the `moov` box contains the movie header `mvhd` plus one `trak`
  *     box per track;
  *   - `mvhd` v0 carries u32 timescale (units/second) at payload offset
  *     12 and u32 duration at 16; v1 widens creation/modification to
  *     u64 so timescale sits at 20 and duration is the u64 at 24;
  *   - duration_ms = duration * 1000 / timescale (integer math).
  *
  * Used by [[VideoMeta]]; returns null for anything it cannot parse —
  * corrupt payloads become null metadata rows to filter, never job
  * failures.
  */
object VideoHeaders {

  private def u32be(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  private def u64be(b: Array[Byte], p: Int): Long =
    (u32be(b, p) << 32) | u32be(b, p + 4)
  private def tag(b: Array[Byte], p: Int, t: String): Boolean =
    b(p) == t.charAt(0) && b(p + 1) == t.charAt(1) &&
      b(p + 2) == t.charAt(2) && b(p + 3) == t.charAt(3)

  /** (format, timescale, duration, duration_ms, n_tracks) as an
    * InternalRow, or null if unparseable — called from both interpreted
    * eval and generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 8) return null
    // walk top-level boxes; find moov
    var p = 0
    var moovStart = -1
    var moovEnd = -1
    var sawFtyp = false
    while (p + 8 <= b.length && moovStart < 0) {
      val size = u32be(b, p)
      if (tag(b, p + 4, "ftyp")) sawFtyp = true
      if (tag(b, p + 4, "moov")) {
        moovStart = p + 8
        moovEnd = math.min(b.length.toLong, p + size).toInt
      }
      if (size < 8) return null // largesize/to-eof unsupported here: corrupt for our purposes
      // Advance in Long: size is an attacker-controlled u32 and .toInt of
      // values >= 2^31 is negative — Int math lets a small forward box plus
      // a huge-size backward box cycle the offset without ever going
      // negative. Require a strictly forward, Int-representable offset.
      val next = p.toLong + size
      if (next <= p || next > Int.MaxValue) return null // non-advancing walk: corrupt
      p = next.toInt
    }
    if (!sawFtyp || moovStart < 0) return null
    // walk moov children: mvhd (required) + count trak boxes
    var q = moovStart
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    while (q + 8 <= moovEnd) {
      val size = u32be(b, q)
      if (tag(b, q + 4, "mvhd")) {
        if (q + 9 > b.length) return null
        val version = b(q + 8) & 0xff
        if (version == 0) {
          if (q + 8 + 20 > b.length) return null
          timescale = u32be(b, q + 8 + 12)
          duration = u32be(b, q + 8 + 16)
        } else if (version == 1) {
          if (q + 8 + 32 > b.length) return null
          timescale = u32be(b, q + 8 + 20)
          duration = u64be(b, q + 8 + 24)
        } else return null
      } else if (tag(b, q + 4, "trak")) {
        nTracks += 1
      }
      if (size < 8) return null
      val next = q.toLong + size // same strictly-forward Long walk as top level
      if (next <= q || next > Int.MaxValue) return null
      q = next.toInt
    }
    if (timescale <= 0 || duration < 0) return null
    row(timescale, duration, duration * 1000L / timescale, nTracks)
  }

  private def row(ts: Long, dur: Long, ms: Long, tracks: Int): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("mp4"), ts.toInt, dur, ms, tracks))
}

/** `video_meta(binary)` → struct<format string, timescale int,
  * duration bigint, duration_ms bigint, n_tracks int>, null when the
  * payload is not a parseable ISO BMFF header. The parse is a static JVM
  * call from generated code — stays inside whole-stage codegen, no UDF
  * serialization, no codec dependency.
  */
case class VideoMeta(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("timescale", IntegerType),
    StructField("duration", LongType),
    StructField("duration_ms", LongType),
    StructField("n_tracks", IntegerType)))
  override def nullable: Boolean = true
  override def prettyName: String = "video_meta"

  override def nullSafeEval(v: Any): Any =
    VideoHeaders.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.VideoHeaders.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoFunctions {
  /** Column API for [[VideoMeta]]. */
  def videoMeta(payload: Column): Column =
    ExpressionUtils.column(VideoMeta(ExpressionUtils.expression(payload)))
}
