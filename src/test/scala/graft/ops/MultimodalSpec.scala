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

  test("sampleFrames explodes every-nth frame index before any decode") {
    val df = Seq((1L, "vid".getBytes("UTF-8"), 10)).toDF("id", "payload", "n_frames")
    val got = Multimodal
      .sampleFrames(df, everyNth = 3, col("n_frames"))
      .select("frame_idx").as[Int].collect().toSeq
    assert(got == Seq(0, 3, 6, 9))
  }
}
