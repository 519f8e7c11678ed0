package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the PCA basis + projection (the oracle for the
  * non-SQL-expressible e_pca/e_whiten queries): orthonormality, descending
  * eigenvalues, agreement with a driver-side dense computation, unit
  * variance after whitening, and exact recovery of a known planted
  * direction.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("planted direction: first PC of points along a known line recovers it") {
    // points t·d + tiny orthogonal jitter, d = normalize([3, 4])
    val d = Array(0.6, 0.8)
    val pts = (0 until 200).map { i =>
      val t = (i % 21) - 10.0
      val j = ((i * 7) % 5 - 2.0) * 0.01
      (i.toLong, Array(t * d(0) - j * d(1), t * d(1) + j * d(0)).map(_.toFloat))
    }
    val df = pts.toDF("id", "vec")
    val b = Embeddings.pcaBasis(df, col("vec"), 2)
    assert(math.abs(math.abs(dot(b.components(0), d)) - 1.0) < 1e-4,
      s"PC1 ${b.components(0).toSeq} should align with $d")
    assert(b.eigenvalues(0) > 100 * b.eigenvalues(1), "variance concentrated on PC1")
  }

  test("real embeddings: orthonormal basis, descending eigenvalues, deterministic sign") {
    val e = graft.io.Tables(spark, "/root/testdata/sf0.001").embeddings
    val b = Embeddings.pcaBasis(e, col("embedding"), 8)
    for (i <- b.components.indices; j <- i until b.components.length) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot(b.components(i), b.components(j)) - want) < 1e-8,
        s"C${i}.C${j} = ${dot(b.components(i), b.components(j))}")
    }
    assert(b.eigenvalues.sameElements(b.eigenvalues.sortBy(-_)), "eigenvalues descending")
    assert(b.eigenvalues.forall(_ >= 0))
    for (c <- b.components) {
      val m = c.indices.maxBy(i => (math.abs(c(i)), -i))
      assert(c(m) > 0, "sign convention: largest-|entry| coordinate positive")
    }
    // refit is bit-identical (deterministic solver + sign convention)
    val b2 = Embeddings.pcaBasis(e, col("embedding"), 8)
    assert(b.components.flatMap(_.toSeq).toSeq == b2.components.flatMap(_.toSeq).toSeq)
  }

  test("pcaProject equals the driver-side dense projection") {
    val e = graft.io.Tables(spark, "/root/testdata/sf0.001").embeddings
    val b = Embeddings.pcaBasis(e, col("embedding"), 4)
    val got = Embeddings.pcaProject(e, col("vec_id"), col("embedding"), b)
      .as[(Long, Array[Double])].collect().toMap
    val raw = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    for ((id, v) <- raw.take(50)) {
      val centered = v.zip(b.mean).map { case (x, m) => x - m }
      val want = b.components.map(c => dot(centered, c))
      val g = got(id)
      assert(g.zip(want).forall { case (x, y) => math.abs(x - y) < 1e-8 },
        s"id=$id got ${g.toSeq} want ${want.toSeq}")
    }
  }

  test("whitened projection has unit sample variance per retained component") {
    val e = graft.io.Tables(spark, "/root/testdata/sf0.001").embeddings
    val b = Embeddings.pcaBasis(e, col("embedding"), 4)
    val w = Embeddings.pcaProject(e, col("vec_id"), col("embedding"), b, whiten = true)
      .select(posexplode(col("proj")).as(Seq("pos", "p")))
      .groupBy("pos").agg(var_pop(col("p")).as("v"))
      .as[(Int, Double)].collect().toMap
    for ((pos, v) <- w)
      assert(math.abs(v - 1.0) < 0.05, s"component $pos variance $v")
  }

  test("projection digest is stable across evaluations") {
    val e = graft.io.Tables(spark, "/root/testdata/sf0.001").embeddings
    val b = Embeddings.pcaBasis(e, col("embedding"), 8)
    def digest() = Embeddings
      .pcaProjectDigest(e, col("vec_id"), col("embedding"), b)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(digest() == digest())
  }
}
