package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

/** Gates for [[Similarity.mmrRerank]] — the greedy argmax is not
  * SQL-expressible, so s_mmr is rows-only and THESE are its acceptance
  * bars, at the exact SparkEntry params (sf0.01, probes id<10, k=5,
  * pool=50, λ=0.7): the MMR invariants plus a measured redundancy
  * reduction against the plain top-k.
  */
class MmrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val v = Tables(spark, dir).embeddings
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val probes = v.filter(col("id") < 10)

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select("query_id", "rank", "nbr_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("s_mmr invariants: first pick is the top-1, output subset of the pool, k rows per query") {
    val pool = rows(Similarity.bruteForceTopK(v, probes, k = 50))
    val mmr = rows(Similarity.mmrRerank(v, probes, k = 5, poolSize = 50))
    val poolSet = pool.map(t => (t._1, t._3)).toSet
    val top1 = pool.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    assert(mmr.nonEmpty)
    for (q <- mmr.map(_._1).distinct) {
      val mine = mmr.filter(_._1 == q).sortBy(_._2)
      assert(mine.size == 5, s"query $q: expected 5 rows, got ${mine.size}")
      // λ-weighted or not, the empty-selected first step IS pure relevance
      assert(mine.head._3 == top1(q), s"query $q: first pick must be the top-1 neighbor")
      assert(mine.forall(t => poolSet((t._1, t._3))), s"query $q: pick outside the pool")
    }
  }

  test("s_mmr determinism: two runs emit identical rows") {
    val a = rows(Similarity.mmrRerank(v, probes, k = 5, poolSize = 50)).sorted
    val b = rows(Similarity.mmrRerank(v, probes, k = 5, poolSize = 50)).sorted
    assert(a == b)
  }

  test("s_mmr reduces redundancy vs plain top-k; lambda=1 degenerates to top-k") {
    val vecs = v.filter(col("id") < 10000)
      .select(col("id"), col("vec").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def meanPairSim(sel: Seq[Long]): Double = {
      val ps = for (i <- sel.indices; j <- i + 1 until sel.size)
        yield cos(vecs(sel(i)), vecs(sel(j)))
      ps.sum / ps.size
    }
    val topk = rows(Similarity.bruteForceTopK(v, probes, k = 5))
    val mmr = rows(Similarity.mmrRerank(v, probes, k = 5, poolSize = 50))
    val qs = mmr.map(_._1).distinct
    val redPlain = qs.map(q => meanPairSim(topk.filter(_._1 == q).map(_._3))).sum / qs.size
    val redMmr = qs.map(q => meanPairSim(mmr.filter(_._1 == q).map(_._3))).sum / qs.size
    info(f"mean pairwise sim: top-k $redPlain%.4f vs MMR $redMmr%.4f")
    assert(redMmr < redPlain,
      f"MMR must reduce mean pairwise redundancy ($redMmr%.4f >= $redPlain%.4f)")
    // λ=1e6: redundancy term vanishes — output IS the plain top-k
    val lam1 = rows(Similarity.rerankPool(
      Similarity.bruteForceTopK(v, probes, k = 50), v, k = 5, lambdaMicro = 1000000L))
    assert(lam1.toSet == topk.toSet,
      "lambda=1 must reproduce the pure-relevance top-k exactly")
  }
}
