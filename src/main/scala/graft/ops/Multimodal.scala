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
    * stands in for a real header decode; keeps tests and oracles exact. */
  def imageMetaStub(df: DataFrame, payload: Column): DataFrame =
    binaryMeta(df, payload)
      .withColumn("width", lit(64) + pmod(col("n_bytes"), lit(960)))
      .withColumn("height", lit(64) + pmod(col("n_bytes") * 7, lit(960)))
      .withColumn("channels", lit(3))

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
