package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

/** Gates for [[Embeddings.jlProject]] — the training-free JL random
  * projection. The oracle row (e_jl_project) pins every output integer;
  * this spec gates the PROPERTY the projection exists for: pairwise
  * squared distances survive, in expectation exactly
  * (E‖Ry‖² = k·‖y‖² for a ±1 matrix R) and per-pair within the JL
  * distortion spread at k=16. Thresholds are pinned to measurements on
  * the sf0.01 embeddings (deterministic data, deterministic signs — the
  * numbers cannot drift).
  */
class JlProjectionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("jlSign is a deterministic fair-ish coin (md5-derived)") {
    val signs = for (j <- 0 until 16; i <- 0 until 64) yield Embeddings.jlSign(j, i)
    assert(signs.forall(s => s == 1L || s == -1L))
    val plus = signs.count(_ == 1L)
    // 1024 hash coins: binomial mean 512, sd 16 — ±5 sd is deterministic
    // slack, not a probabilistic bound (the values never change)
    assert(math.abs(plus - 512) <= 80, s"sign bias: $plus of ${signs.size} positive")
    assert(Embeddings.jlSign(0, 0) == Embeddings.jlSign(0, 0))
  }

  test("k=16 projection preserves pairwise squared distances (JL property)") {
    val e = Tables(spark, dir).embeddings
    val k = 16
    val sample = e.filter(col("vec_id") < 40)
    val proj = Embeddings
      .jlProject(sample, col("vec_id"), col("embedding"), dim = 64, k = k)
      .groupBy(col("id"))
      .agg(collect_list(struct(col("pos"), col("y_micro"))).as("ys"))
      .select(col("id"), transform(array_sort(col("ys")), y => y("y_micro")).as("y"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val orig = sample
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted
    val ratios = for {
      ai <- ids.indices; bi <- ai + 1 until ids.size
      a = ids(ai); b = ids(bi)
      dOrig = sq(orig(a), orig(b)) if dOrig > 0
    } yield {
      // y is integer micro: rescale to the original unit, normalize by k
      // (E‖Ry‖² = k·‖y‖²)
      val dProj = sq(proj(a).map(_ / 1e6), proj(b).map(_ / 1e6))
      dProj / (k * dOrig)
    }
    assert(ratios.nonEmpty, "gate is vacuous: no pairs")
    val mean = ratios.sum / ratios.size
    val within = ratios.count(r => r >= 0.4 && r <= 2.2).toDouble / ratios.size
    info(f"JL ratio mean=$mean%.3f, within [0.4,2.2]: ${within * 100}%.1f%% of ${ratios.size}")
    assert(mean >= 0.8 && mean <= 1.25, s"mean distance ratio $mean outside [0.8, 1.25]")
    assert(within >= 0.85, s"only ${within * 100}%% of pairs within [0.4, 2.2]")
  }
}
