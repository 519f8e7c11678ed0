package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "payload-one".getBytes("UTF-8")),
    (2L, "payload-two-longer".getBytes("UTF-8")),
    (3L, Array.empty[Byte]))

  test("binaryMeta computes byte length and digest without shuffle") {
    val df = docs.toDF("id", "payload")
    val got = Multimodal.binaryMeta(df, col("payload"))
      .select("id", "n_bytes").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 11, 2L -> 18, 3L -> 0))
    // per-row expressions only: no exchange in the plan
    val plan = Multimodal.binaryMeta(df, col("payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("decodeImagesStub: per-partition batched decode, deterministic dims") {
    val df = docs.toDF("id", "payload")
    val frames = Multimodal.decodeImagesStub(df).collect().sortBy(_.id)
    assert(frames.map(_.id).toSeq == Seq(1L, 2L, 3L))
    assert(frames.forall(f => f.width >= 16 && f.width < 64 && f.height >= 16 && f.height < 64))
    assert(frames.forall(f => f.pixels.length == math.min(f.width * f.height, 4096)))
    // determinism: same payload -> same dims on a second run
    val again = Multimodal.decodeImagesStub(df).collect().sortBy(_.id)
    assert(frames.map(f => (f.id, f.width, f.height)).toSeq ==
      again.map(f => (f.id, f.width, f.height)).toSeq)
  }

  test("imageMeta parses real PNG/JPEG/GIF headers round-trip through synthesis") {
    val df = Seq(
      (1L, "png", 800L, 600L),
      (2L, "jpeg", 1L, 65535L), // u16 extremes survive the BE read
      (3L, "gif", 320L, 200L), // LE layout differs from PNG/JPEG's BE
      (4L, "png", 1L, 1L))
      .toDF("id", "fmt", "w", "h")
      .select(
        col("id"), col("fmt"), col("w"), col("h"),
        Multimodal.syntheticImagePayload(col("fmt"), col("w"), col("h")).as("payload"))
    val got = Multimodal.imageMeta(df, col("payload"))
      .select("id", "format", "width", "height")
      .as[(Long, String, Int, Int)].collect().toSet
    assert(got == Set(
      (1L, "png", 800, 600), (2L, "jpeg", 1, 65535), (3L, "gif", 320, 200), (4L, "png", 1, 1)))
  }

  test("imageMeta: JPEG marker scan skips extra segments; garbage yields null, not failure") {
    import org.apache.spark.sql.graft.ImageHeaders
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // SOI + COM(len 5) + APP1(len 4) + SOF2 (progressive): h=0x0102, w=0x0304
    val multiSeg = hex("FFD8 FFFE0005616263 FFE100044142 FFC2000B08 0102 0304 01 011100")
    val r = ImageHeaders.parse(multiSeg)
    assert(r != null && r.getInt(1) == 0x0304 && r.getInt(2) == 0x0102)
    // GIF87a variant parses too
    val gif87 = hex("474946383761" + "4001" + "F000" + "00")
    val g = ImageHeaders.parse(gif87)
    assert(g != null && g.getString(0) == "gif" && g.getInt(1) == 320 && g.getInt(2) == 240)
    // truncated / garbage / desynced: null, never a throw
    assert(ImageHeaders.parse(null) == null)
    assert(ImageHeaders.parse(Array.empty[Byte]) == null)
    assert(ImageHeaders.parse("not an image at all".getBytes("UTF-8")) == null)
    assert(ImageHeaders.parse(hex("89504E470D0A1A0A00000000")) == null) // PNG cut before IHDR
    assert(ImageHeaders.parse(hex("FFD8FFE000104A4649")) == null) // JPEG cut mid-APP0
    // ANSI-mode plumbing: nulls flow through the column path
    val df = Seq((1L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val viaCol = Multimodal.imageMeta(df, col("payload"))
      .select("format").collect().head
    assert(viaCol.isNullAt(0))
  }

  test("audioMeta parses RIFF/WAVE headers round-trip through synthesis") {
    val df = Seq(
      (1L, 1, 8000, 16, 4000L, false),
      (2L, 2, 44100, 16, 1000L, true), // JUNK chunk before fmt: real walk
      (3L, 2, 16000, 8, 1L, false)) // 8-bit mono-sample edge
      .toDF("id", "ch", "rate", "bits", "n", "junk")
      .select(
        col("id"), col("ch"), col("rate"), col("bits"), col("n"),
        Multimodal
          .syntheticWavPayload(col("ch"), col("rate"), col("bits"), col("n"), col("junk"))
          .as("payload"))
    val got = Multimodal.audioMeta(df, col("payload"))
      .select("id", "format", "channels", "sample_rate", "bits", "n_samples", "duration_ms")
      .as[(Long, String, Int, Int, Int, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "wav", 1, 8000, 16, 4000L, 500L),
      (2L, "wav", 2, 44100, 16, 1000L, 22L), // 1000*1000/44100 floor
      (3L, "wav", 2, 16000, 8, 1L, 0L)))
  }

  test("audioMeta: hand-built bytes parse; corrupt payloads yield null, not failure") {
    import java.nio.{ByteBuffer, ByteOrder}
    import org.apache.spark.sql.graft.AudioHeaders
    // ground truth built independently of syntheticWavPayload: 16-bit
    // stereo 22050 Hz, 441 samples => data 1764 bytes, duration 20 ms
    val buf = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 1764).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(22050).putInt(22050 * 4).putShort(4).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(1764)
    val r = AudioHeaders.parse(buf.array())
    assert(r != null && r.getInt(1) == 2 && r.getInt(2) == 22050 && r.getInt(3) == 16)
    assert(r.getLong(4) == 441L && r.getLong(5) == 20L)
    // odd-sized chunk before fmt must be walked word-aligned (3 -> 4)
    val odd = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    odd.put("RIFF".getBytes("US-ASCII")).putInt(48).put("WAVE".getBytes("US-ASCII"))
    odd.put("LIST".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0)) // 3 + pad
    odd.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    odd.put("data".getBytes("US-ASCII")).putInt(16000)
    val o = AudioHeaders.parse(odd.array())
    assert(o != null && o.getInt(1) == 1 && o.getInt(2) == 8000 && o.getLong(5) == 2000L)
    // fmt alone, data chunk missing -> unparseable (dataSize unknown)
    assert(AudioHeaders.parse(java.util.Arrays.copyOf(odd.array(), 48)) == null)
    assert(AudioHeaders.parse(null) == null)
    assert(AudioHeaders.parse(Array.empty[Byte]) == null)
    assert(AudioHeaders.parse("RIFFxxxxWAVE".getBytes("US-ASCII")) == null)
    assert(AudioHeaders.parse("not audio".getBytes("UTF-8")) == null)
    // crafted size fields whose .toInt makes the walk advance by exactly 0
    // (0xFFFFFFF8 -> -8, 0xFFFFFFF7 -> -9 + pad 1): must return null, not
    // spin the task forever
    for (evil <- Seq(0xFFFFFFF8, 0xFFFFFFF7, 0x80000000)) {
      val loop = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      loop.put("RIFF".getBytes("US-ASCII")).putInt(16).put("WAVE".getBytes("US-ASCII"))
      loop.put("JUNK".getBytes("US-ASCII")).putInt(evil).putInt(0)
      assert(AudioHeaders.parse(loop.array()) == null)
    }
    // ANSI-mode plumbing: nulls flow through the column path
    val df = Seq((1L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val viaCol = Multimodal.audioMeta(df, col("payload")).select("format").collect().head
    assert(viaCol.isNullAt(0))
  }

  test("videoMeta parses ISO BMFF headers round-trip through synthesis") {
    val df = Seq(
      (1L, 600, 18000L, 1), // 30 s at the QuickTime default timescale
      (2L, 90000, 3003L, 3), // NTSC-ish: 33 ms
      (3L, 1000, 0L, 2)) // zero-duration live-init shape
      .toDF("id", "ts", "dur", "n")
      .select(
        col("id"), col("ts"), col("dur"), col("n"),
        Multimodal.syntheticMp4Payload(col("ts"), col("dur"), col("n")).as("payload"))
    val got = Multimodal.videoMeta(df, col("payload"))
      .select("id", "format", "timescale", "duration", "duration_ms", "n_tracks")
      .as[(Long, String, Int, Long, Long, Int)].collect().toSet
    assert(got == Set(
      (1L, "mp4", 600, 18000L, 30000L, 1),
      (2L, "mp4", 90000, 3003L, 33L, 3),
      (3L, "mp4", 1000, 0L, 0L, 2)))
  }

  test("videoMeta: hand-built v1 mvhd parses; corrupt payloads yield null, not failure") {
    import java.nio.ByteBuffer
    import org.apache.spark.sql.graft.VideoHeaders
    // ground truth built independently of syntheticMp4Payload: mvhd
    // VERSION 1 (64-bit times; synthesis only emits v0) inside moov,
    // preceded by a free box the top-level walk must skip
    val mvhdV1Size = 8 + 4 + 8 + 8 + 4 + 8 // header + ver/flags + c/m-time64 + timescale + dur64
    val moovSize = 8 + mvhdV1Size + 8 // + one empty trak
    val buf = ByteBuffer.allocate(16 + 8 + moovSize) // BMFF is big-endian (ByteBuffer default)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII")).put("isom".getBytes("US-ASCII")).putInt(0)
    buf.putInt(8).put("free".getBytes("US-ASCII"))
    buf.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    buf.putInt(mvhdV1Size).put("mvhd".getBytes("US-ASCII"))
      .putInt(0x01000000) // version 1, flags 0
      .putLong(0L).putLong(0L) // creation/modification, 64-bit
      .putInt(48000).putLong(96000L) // timescale, duration64 -> 2000 ms
    buf.putInt(8).put("trak".getBytes("US-ASCII"))
    val r = VideoHeaders.parse(buf.array())
    assert(r != null && r.getInt(1) == 48000 && r.getLong(2) == 96000L)
    assert(r.getLong(3) == 2000L && r.getInt(4) == 1)
    // corrupt shapes: null, never a throw
    assert(VideoHeaders.parse(null) == null)
    assert(VideoHeaders.parse(Array.empty[Byte]) == null)
    assert(VideoHeaders.parse("not a video".getBytes("UTF-8")) == null)
    // ftyp but no moov
    val noMoov = ByteBuffer.allocate(16)
    noMoov.putInt(16).put("ftyp".getBytes("US-ASCII")).put("isom".getBytes("US-ASCII")).putInt(0)
    assert(VideoHeaders.parse(noMoov.array()) == null)
    // moov but never a ftyp signature
    val noFtyp = ByteBuffer.allocate(8)
    noFtyp.putInt(8).put("moov".getBytes("US-ASCII"))
    assert(VideoHeaders.parse(noFtyp.array()) == null)
    // crafted huge-size box whose .toInt jumps BACKWARD (0xFFFFFFF0 -> -16
    // from p=16 lands on p=0, cycling 0 -> 16 -> 0 without ever going
    // negative): must return null, not spin the task forever
    val cycle = ByteBuffer.allocate(28)
    cycle.putInt(16).put("ftyp".getBytes("US-ASCII")).put("isom".getBytes("US-ASCII")).putInt(0)
    cycle.putInt(0xFFFFFFF0).put("free".getBytes("US-ASCII")).putInt(0)
    assert(VideoHeaders.parse(cycle.array()) == null)
    // same shape inside the moov child walk
    val childCycle = ByteBuffer.allocate(16 + 8 + 12)
    childCycle.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    childCycle.putInt(20).put("moov".getBytes("US-ASCII"))
    childCycle.putInt(0xFFFFFFF0).put("free".getBytes("US-ASCII")).putInt(0)
    assert(VideoHeaders.parse(childCycle.array()) == null)
    // ANSI-mode plumbing: nulls flow through the column path
    val df = Seq((1L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val viaCol = Multimodal.videoMeta(df, col("payload")).select("format").collect().head
    assert(viaCol.isNullAt(0))
  }

  test("exifMeta parses both byte orders round-trip through synthesis") {
    val df = Seq((1L, 6, 640, 480, true), (2L, 1, 800, 600, false))
      .toDF("id", "o", "w", "h", "be")
    val got = Multimodal
      .exifMeta(
        df.withColumn("payload",
          Multimodal.syntheticExifPayload(col("o"), col("w"), col("h"), col("be"))),
        col("payload"))
      .select("id", "endian", "orientation", "exif_w", "exif_h")
      .as[(Long, String, Int, Int, Int)].collect().toSet
    assert(got == Set((1L, "MM", 6, 640, 480), (2L, "II", 1, 800, 600)))
  }

  test("exifMeta: hand-built TIFF walks; corrupt/absent APP1 yields null, not failure") {
    import org.apache.spark.sql.graft.ExifHeaders
    // hand-assemble a little-endian Exif JPEG: orientation only, no Exif IFD
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val tiff = b(
      'I', 'I', 42, 0, 8, 0, 0, 0, // II, 42 LE, IFD0 at 8
      1, 0, // one entry
      0x12, 0x01, 3, 0, 1, 0, 0, 0, 8, 0, 0, 0, // tag 0x0112 SHORT 1 value 8
      0, 0, 0, 0) // next IFD = 0
    val jpeg = b(0xff, 0xd8, 0xff, 0xe1, 0, (2 + 6 + tiff.length),
      'E', 'x', 'i', 'f', 0, 0) ++ tiff ++ b(0xff, 0xd9)
    val row = ExifHeaders.parse(jpeg)
    assert(row != null && row.getUTF8String(0).toString == "II" && row.getInt(1) == 8)
    assert(row.isNullAt(2) && row.isNullAt(3)) // no Exif IFD -> null dims
    // plain JPEG without APP1 -> null; truncated TIFF -> null; junk -> null
    assert(ExifHeaders.parse(b(0xff, 0xd8, 0xff, 0xda, 0, 2)) == null)
    assert(ExifHeaders.parse(jpeg.take(14)) == null)
    assert(ExifHeaders.parse("junk".getBytes("UTF-8")) == null)
    // wrong TIFF magic -> null
    val bad = jpeg.clone(); bad(14) = 41
    assert(ExifHeaders.parse(bad) == null)
  }

  test("sampleFrames explodes every-nth frame index before any decode") {
    val df = Seq((1L, "vid".getBytes("UTF-8"), 10)).toDF("id", "payload", "n_frames")
    val got = Multimodal
      .sampleFrames(df, everyNth = 3, col("n_frames"))
      .select("frame_idx").as[Int].collect().toSeq
    assert(got == Seq(0, 3, 6, 9))
  }
}
