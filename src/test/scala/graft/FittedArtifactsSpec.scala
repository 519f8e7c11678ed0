package graft

import org.apache.spark.sql.functions._

/** Pins `FittedArtifacts` (the sf0.01-fitted model literals the oracle
  * SQL embeds) to a live refit over the same data — bit-exact equality.
  * This is the tripwire that fires BEFORE the driver's correctness
  * record does: if the seed-42 testdata is ever regenerated with
  * different values, or any fit path loses determinism, this spec goes
  * red locally and the fix is one `runMain graft.FitDump` away.
  */
class FittedArtifactsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("IVF centroids: refit == embedded literals (bit-exact)") {
    val t = graft.io.Tables(spark, sfDir)
    val c = t.embeddings.select(
      col("vec_id").as("nbr_id"),
      col("embedding").cast("array<double>").as("nbr_vec"))
    val refit = graft.ops.Similarity.fitCentroidsArray(c, "nbr_id", "nbr_vec", k = 16)
    assert(refit.map(_.toSeq).toSeq == FittedArtifacts.ivfCentroids.map(_.toSeq).toSeq)
  }

  test("decon IVF centroids (k=64): refit == embedded literals (bit-exact)") {
    val t = graft.io.Tables(spark, sfDir)
    val c = t.embeddings.select(
      col("vec_id").as("nbr_id"),
      col("embedding").cast("array<double>").as("nbr_vec"))
    val refit = graft.ops.Similarity.fitCentroidsArray(c, "nbr_id", "nbr_vec", k = 64)
    assert(refit.map(_.toSeq).toSeq == FittedArtifacts.deconIvfCentroids.map(_.toSeq).toSeq)
  }

  test("PQ codebooks: refit == embedded literals (bit-exact)") {
    val t = graft.io.Tables(spark, sfDir)
    val cNv = t.embeddings.select(
      col("vec_id").as("nbr_id"),
      graft.ops.Similarity.unitNorm(col("embedding").cast("array<double>")).as("nv"))
    val refit =
      graft.ops.Similarity.pqFitCodebooks(cNv, m = 16, nCentroids = 16, fitSample = 2048)
    assert(refit == FittedArtifacts.pqCodebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("PCA basis: refit == embedded literals (bit-exact)") {
    val t = graft.io.Tables(spark, sfDir)
    val basis = graft.ops.Embeddings.pcaBasis(t.embeddings, col("embedding"), k = 8)
    assert(basis.mean.toSeq == FittedArtifacts.pcaMean.toSeq)
    assert(basis.components.map(_.toSeq).toSeq ==
      FittedArtifacts.pcaComponents.map(_.toSeq).toSeq)
    val whitenDiv = basis.eigenvalues.map(l => if (l > 1e-9) math.sqrt(l) else 1.0)
    assert(whitenDiv.toSeq == FittedArtifacts.pcaWhitenDiv.toSeq)
  }
}
