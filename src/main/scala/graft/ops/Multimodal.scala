package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The Spark-side mechanics (schema, batched per-partition processing,
  * deterministic metadata derivation) are real; the actual media decode is
  * STUBBED (`decodeImageStub`) because no image/audio codec libraries ship
  * in this environment — swap the stub body for a real decoder (e.g.
  * javax.imageio / ffmpeg bindings) without touching the plumbing.
  */
object Multimodal {

  /** Byte length + content digest for a binary payload column — pure
    * column expressions, no shuffle. */
  def binaryMeta(df: DataFrame, payload: Column): DataFrame =
    df.withColumn("n_bytes", length(payload))
      .withColumn("digest", md5(payload))

  /** Deterministic FAKE image dimensions derived from payload size —
    * stands in for a real header decode; keeps tests and oracles exact.
    * For real container headers use [[imageMeta]]. */
  def imageMetaStub(df: DataFrame, payload: Column): DataFrame =
    binaryMeta(df, payload)
      .withColumn("width", lit(64) + pmod(col("n_bytes"), lit(960)))
      .withColumn("height", lit(64) + pmod(col("n_bytes") * 7, lit(960)))
      .withColumn("channels", lit(3))

  /** REAL image metadata from container headers: PNG IHDR / JPEG SOFn
    * marker scan / GIF logical screen descriptor, parsed by the native
    * codegen'd [[org.apache.spark.sql.graft.ImageMeta]] expression — no
    * codec library, pure header arithmetic. Unparseable payloads yield
    * null format/width/height (never a job failure).
    */
  def imageMeta(df: DataFrame, payload: Column): DataFrame =
    binaryMeta(df, payload)
      .withColumn("__meta", org.apache.spark.sql.graft.ImageFunctions.imageMeta(payload))
      .withColumn("format", col("__meta.format"))
      .withColumn("width", col("__meta.width"))
      .withColumn("height", col("__meta.height"))
      .drop("__meta")

  /** Synthesize a payload with a REAL PNG/JPEG/GIF header (and fake pixel
    * content) for the given dims — pure column expressions, so oracles can
    * predict [[imageMeta]]'s output arithmetically while the parser still
    * has to walk genuine container layouts (including the JPEG APP0
    * segment skip). `fmt` ∈ png|jpeg|gif; anything else yields null.
    */
  def syntheticImagePayload(fmt: Column, w: Column, h: Column): Column = {
    def be(c: Column, hexDigits: Int) = unhex(lpad(hex(c), hexDigits, "0"))
    def le2(c: Column) = {
      val hx = lpad(hex(c), 4, "0")
      unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    when(fmt === "png",
      // signature + IHDR length/type + w(4 BE) + h(4 BE) + depth/color/etc
      concat(unhex(lit("89504E470D0A1A0A0000000D49484452")), be(w, 8), be(h, 8),
        unhex(lit("0806000000"))))
      .when(fmt === "jpeg",
        // SOI + APP0(len 16, JFIF) + SOF0(len 17): prec, h(2 BE), w(2 BE), comps
        concat(unhex(lit("FFD8FFE000104A46494600010100000100010000FFC0001108")),
          be(h, 4), be(w, 4), unhex(lit("03011100021101031101"))))
      .when(fmt === "gif",
        // GIF89a + logical screen w(2 LE) + h(2 LE) + flags
        concat(unhex(lit("474946383961")), le2(w), le2(h), unhex(lit("F70000"))))
  }

  /** REAL EXIF metadata (JPEG APP1 → TIFF IFD walk) via the native
    * codegen'd [[org.apache.spark.sql.graft.ExifMeta]] expression —
    * orientation + pixel dimensions, BOTH byte orders ("II"/"MM")
    * handled, because pipelines must normalize orientation BEFORE any
    * resize/crop. Unparseable payloads yield a null struct.
    */
  def exifMeta(df: DataFrame, payload: Column): DataFrame =
    df
      .withColumn("__meta", org.apache.spark.sql.graft.ExifFunctions.exifMeta(payload))
      .withColumn("endian", col("__meta.endian"))
      .withColumn("orientation", col("__meta.orientation"))
      .withColumn("exif_w", col("__meta.exif_w"))
      .withColumn("exif_h", col("__meta.exif_h"))
      .drop("__meta")

  /** Synthesize a JPEG carrying a REAL APP1/Exif/TIFF block — IFD0 with
    * Orientation + Exif-IFD pointer, Exif IFD with pixel dims — in the
    * requested byte order ('II' little / 'MM' big), pure column
    * expressions so an oracle predicts [[exifMeta]] arithmetically while
    * the parser still walks a genuine endian-parameterized TIFF layout.
    * Layout (offsets relative to TIFF start): header 8 B, IFD0 at 8
    * (2 entries + next-pointer = 30 B), Exif IFD at 38; APP1 length
    * 2 + 6 + 68 = 76.
    */
  def syntheticExifPayload(
      orient: Column, w: Column, h: Column, bigEndian: Column): Column = {
    def be(c: Column, hexDigits: Int) = unhex(lpad(hex(c), hexDigits, "0"))
    def le(c: Column, hexDigits: Int) = {
      val hx = lpad(hex(c), hexDigits, "0")
      unhex(concat((hexDigits - 2 to 0 by -2).map(i => substring(hx, i + 1, 2)): _*))
    }
    def u16(c: Column) = when(bigEndian, be(c, 4)).otherwise(le(c, 4))
    def u32(c: Column) = when(bigEndian, be(c, 8)).otherwise(le(c, 8))
    val tiff = concat(
      when(bigEndian, unhex(lit("4D4D"))).otherwise(unhex(lit("4949"))),
      u16(lit(42)), u32(lit(8)),
      // IFD0: 2 entries; SHORT values sit left-justified in the 4-byte field
      u16(lit(2)),
      u16(lit(0x0112)), u16(lit(3)), u32(lit(1)), u16(orient), unhex(lit("0000")),
      u16(lit(0x8769)), u16(lit(4)), u32(lit(1)), u32(lit(38)),
      u32(lit(0)),
      // Exif IFD: pixel dims as LONGs
      u16(lit(2)),
      u16(lit(0xa002)), u16(lit(4)), u32(lit(1)), u32(w),
      u16(lit(0xa003)), u16(lit(4)), u32(lit(1)), u32(h),
      u32(lit(0)))
    concat(unhex(lit("FFD8FFE1004C457869660000")), tiff, unhex(lit("FFD9")))
  }

  /** REAL audio metadata from RIFF/WAVE headers (fmt chunk + data chunk
    * size), parsed by the native codegen'd
    * [[org.apache.spark.sql.graft.AudioMeta]] expression — no codec
    * library, pure chunk-walk arithmetic. Unparseable payloads yield a
    * null struct (never a job failure).
    */
  def audioMeta(df: DataFrame, payload: Column): DataFrame =
    binaryMeta(df, payload)
      .withColumn("__meta", org.apache.spark.sql.graft.AudioFunctions.audioMeta(payload))
      .withColumn("format", col("__meta.format"))
      .withColumn("channels", col("__meta.channels"))
      .withColumn("sample_rate", col("__meta.sample_rate"))
      .withColumn("bits", col("__meta.bits"))
      .withColumn("n_samples", col("__meta.n_samples"))
      .withColumn("duration_ms", col("__meta.duration_ms"))
      .drop("__meta")

  /** Synthesize a header-only RIFF/WAVE payload for the given PCM shape —
    * pure column expressions, so oracles can predict [[audioMeta]]'s
    * output arithmetically while the parser still has to walk a genuine
    * chunk layout. When `junk` is true a word-aligned "JUNK" chunk is
    * inserted before "fmt " (real files front-load alignment chunks), so
    * the chunk walk is exercised, not just fixed offsets. The "data"
    * chunk is declared (size = nSamples * blockAlign) but its payload is
    * absent — [[AudioHeaders]] reads only the size field, the
    * truncated-upload shape.
    */
  def syntheticWavPayload(
      channels: Column, sampleRate: Column, bits: Column, nSamples: Column,
      junk: Column): Column = {
    def le(c: Column, hexDigits: Int) = {
      val hx = lpad(hex(c), hexDigits, "0")
      // reverse byte order: hex pairs from least-significant first
      unhex(concat((hexDigits - 2 to 0 by -2).map(i => substring(hx, i + 1, 2)): _*))
    }
    val blockAlign = channels * (bits / lit(8))
    val byteRate = sampleRate * blockAlign
    val dataSize = nSamples * blockAlign
    val fmtAndData = concat(
      unhex(lit("666D7420")), le(lit(16), 8), le(lit(1), 4), // "fmt ", size, PCM
      le(channels, 4), le(sampleRate, 8), le(byteRate, 8),
      le(blockAlign, 4), le(bits, 4),
      unhex(lit("64617461")), le(dataSize, 8)) // "data", size (payload absent)
    val junkChunk = unhex(lit("4A554E4B040000000DF0ADBA")) // "JUNK" + size 4 + filler
    val body = when(junk, concat(junkChunk, fmtAndData)).otherwise(fmtAndData)
    concat(
      unhex(lit("52494646")), le(length(body) + 4, 8), // "RIFF" + riff size
      unhex(lit("57415645")), body) // "WAVE"
  }

  /** REAL video metadata from ISO BMFF (MP4) headers: the moov/mvhd box
    * walk gives timescale + duration, counting trak children gives the
    * track count — parsed by the native codegen'd
    * [[org.apache.spark.sql.graft.VideoMeta]] expression. No codec
    * library; unparseable payloads yield a null struct.
    */
  def videoMeta(df: DataFrame, payload: Column): DataFrame =
    binaryMeta(df, payload)
      .withColumn("__meta", org.apache.spark.sql.graft.VideoFunctions.videoMeta(payload))
      .withColumn("format", col("__meta.format"))
      .withColumn("timescale", col("__meta.timescale"))
      .withColumn("duration", col("__meta.duration"))
      .withColumn("duration_ms", col("__meta.duration_ms"))
      .withColumn("n_tracks", col("__meta.n_tracks"))
      .drop("__meta")

  /** Synthesize a header-only ISO BMFF payload (ftyp + moov[mvhd v0 +
    * `nTracks` empty trak boxes]) — pure column expressions (hex-string
    * assembly, one `unhex`), so oracles can predict [[videoMeta]]'s
    * output arithmetically while the parser still has to walk genuine
    * nested box layouts with computed sizes. No mdat: metadata-only, the
    * moov-before-media shape of a faststart file.
    */
  def syntheticMp4Payload(timescale: Column, duration: Column, nTracks: Column): Column = {
    def be(c: Column, hexDigits: Int) = lpad(hex(c), hexDigits, "0")
    val mvhdHex = concat(
      // size 108 + 'mvhd' + v0/flags + ctime + mtime
      lit("0000006C" + "6D766864" + "00000000" + "00000000" + "00000000"),
      be(timescale, 8), be(duration, 8),
      lit("00" * 80)) // rate..next_track_id zeroed
    val trakHex = repeat(lit("000000087472616B"), nTracks) // empty trak boxes
    val moovSize = lit(8 + 108) + nTracks * lit(8)
    unhex(concat(
      lit("000000106674797069736F6D00000000"), // ftyp(16): major 'isom', minor 0
      be(moovSize, 8), lit("6D6F6F76"), // moov header
      mvhdHex, trakHex))
  }

  final case class DecodedFrame(id: Long, width: Int, height: Int, pixels: Array[Byte])

  /** Per-partition batched decode — the shape a real codec integration
    * needs (amortize decoder init across a partition, never per row).
    * Input rows: (id, payload). The decode itself is a stub: a
    * deterministic fake "image" whose dims derive from the payload hash.
    */
  def decodeImagesStub(df: DataFrame): Dataset[DecodedFrame] = {
    val enc = Encoders.product[DecodedFrame]
    df.select(col("id").cast("long"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        // real impl: init one decoder here, reuse for the whole partition
        rows.map { case (id, payload) =>
          val h = java.util.Arrays.hashCode(payload)
          val w = 16 + math.floorMod(h, 48)
          val ht = 16 + math.floorMod(h / 48, 48)
          // stubbed pixel buffer: sized like a decode, content fake
          DecodedFrame(id, w, ht, new Array[Byte](math.min(w * ht, 4096)))
        }
      }(enc)
  }

  /** Frame-sampling plumbing for video-like payloads: one row per sampled
    * frame index — the explode happens before any heavy decode so a real
    * decoder would only touch sampled frames.
    */
  def sampleFrames(df: DataFrame, everyNth: Int, totalFrames: Column): DataFrame =
    df.withColumn(
      "frame_idx",
      explode(sequence(lit(0), greatest(totalFrames - 1, lit(0)), lit(everyNth))))
}
