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

  test("sampleFrames explodes every-nth frame index before any decode") {
    val df = Seq((1L, "vid".getBytes("UTF-8"), 10)).toDF("id", "payload", "n_frames")
    val got = Multimodal
      .sampleFrames(df, everyNth = 3, col("n_frames"))
      .select("frame_idx").as[Int].collect().toSeq
    assert(got == Seq(0, 3, 6, 9))
  }
}
