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

/** Pure-JVM audio container header parsing — no codec library, just the
  * published RIFF/WAVE layout (RIFF spec / RFC 2361):
  *
  *   - 12-byte preamble: "RIFF" + little-endian u32 riff size + "WAVE";
  *   - then a chunk walk: 4-byte id + LE u32 size + payload, each chunk
  *     word-aligned (odd sizes padded by one byte);
  *   - the "fmt " chunk carries LE u16 audio format, u16 channels,
  *     u32 sample rate, u32 byte rate, u16 block align, u16 bits/sample;
  *   - the "data" chunk's SIZE field gives the PCM byte count — the
  *     payload itself need not be present (truncated uploads still yield
  *     metadata), so n_samples = data_size / block_align and
  *     duration_ms = n_samples * 1000 / sample_rate (integer math).
  *
  * Used by [[AudioMeta]]; returns null for anything it cannot parse —
  * corrupt payloads become null metadata rows to filter, never job
  * failures.
  */
object AudioHeaders {

  private def u16le(b: Array[Byte], p: Int): Int =
    ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)
  private def u32le(b: Array[Byte], p: Int): Long =
    ((b(p + 3) & 0xffL) << 24) | ((b(p + 2) & 0xffL) << 16) |
      ((b(p + 1) & 0xffL) << 8) | (b(p) & 0xffL)
  private def tag(b: Array[Byte], p: Int, t: String): Boolean =
    b(p) == t.charAt(0) && b(p + 1) == t.charAt(1) &&
      b(p + 2) == t.charAt(2) && b(p + 3) == t.charAt(3)

  /** (format, channels, sample_rate, bits, n_samples, duration_ms) as an
    * InternalRow, or null if unparseable — called from both interpreted
    * eval and generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var p = 12
    var channels = -1
    var sampleRate = -1L
    var bits = -1
    var blockAlign = -1
    var dataSize = -1L
    while (p + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val size = u32le(b, p + 4)
      if (tag(b, p, "fmt ")) {
        if (size < 16 || p + 8 + 16 > b.length) return null
        channels = u16le(b, p + 10)
        sampleRate = u32le(b, p + 12)
        blockAlign = u16le(b, p + 20)
        bits = u16le(b, p + 22)
      } else if (tag(b, p, "data")) {
        dataSize = size
      }
      // Advance in Long: size is an attacker-controlled u32, and .toInt of
      // values >= 2^31 is negative — Int math lets a crafted size make the
      // offset cycle (e.g. 0xFFFFFFF8 advances by exactly 0) and spin the
      // task forever. Require a strictly forward, Int-representable offset.
      val next = p.toLong + 8L + size + (size & 1L) // chunks are word-aligned
      if (next <= p || next > Int.MaxValue) return null // non-advancing walk: corrupt
      p = next.toInt
    }
    if (channels <= 0 || sampleRate <= 0 || blockAlign <= 0 || dataSize < 0) return null
    val nSamples = dataSize / blockAlign
    row(channels, sampleRate, bits, nSamples, nSamples * 1000L / sampleRate)
  }

  private def row(ch: Int, sr: Long, bits: Int, n: Long, ms: Long): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("wav"), ch, sr.toInt, bits, n, ms))
}

/** `audio_meta(binary)` → struct<format string, channels int,
  * sample_rate int, bits int, n_samples bigint, duration_ms bigint>,
  * null when the payload is not a parseable RIFF/WAVE header. The parse
  * is a static JVM call from generated code — stays inside whole-stage
  * codegen, no UDF serialization, no codec dependency.
  */
case class AudioMeta(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta"

  override def nullSafeEval(v: Any): Any =
    AudioHeaders.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.AudioHeaders.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioFunctions {
  /** Column API for [[AudioMeta]]. */
  def audioMeta(payload: Column): Column =
    ExpressionUtils.column(AudioMeta(ExpressionUtils.expression(payload)))
}
