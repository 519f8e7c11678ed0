package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column transforms for training-data pipelines: storage-side
  * operations on `array<float>` columns (the similarity/ANN search side
  * lives in [[Similarity]]). Pure per-row projections — no shuffle, scale
  * linearly with row count.
  */
object Embeddings {

  /** Symmetric per-vector int8 quantization — the standard 4× storage
    * shrink for ANN candidate stores: `scale = 127 / max|v_i|`,
    * `q_i = clamp(⌊v_i·scale + 0.5⌋, ±127)`.
    *
    * Returns (id, q, scale) with `q: array<long>` of values in
    * [-127, 127]. Every arithmetic step (float→double widening, one
    * division, one multiply, floor, integer clamp) is individually
    * IEEE-exact and order-free, so the quantized vector is
    * bit-reproducible on any engine — dequantize as `q_i / scale`.
    * All-zero vectors quantize to all-zero (scale pinned to 1 so no
    * 0·∞ NaN path exists).
    *
    * `transform` over the array is an interpreted higher-order function
    * (CodegenFallback) like the HOF cosine in [[Similarity]]; if
    * quantization ever sits in a hot loop rather than a one-time
    * storage pass, the codegen'd-Expression route of
    * `org.apache.spark.sql.graft.VectorExpressions` is the upgrade
    * path.
    */
  def quantizeInt8(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val v = vec.cast("array<double>")
    val m = array_max(transform(v, x => abs(x)))
    val scale = when(m > 0d, lit(127.0) / m).otherwise(lit(1.0))
    df.select(
      id.as("id"),
      // bind the scale scalar once per row: referenced bare inside the
      // interpreted lambda it re-runs its array_max pass PER ELEMENT
      // (dim× redundant work — the Cols.bindOnce pathology at dim grain)
      Cols.bindOnce(scale)(sc =>
        transform(v, x =>
          greatest(lit(-127L), least(lit(127L), floor(x * sc + lit(0.5)))))).as("q"),
      scale.as("scale"))
  }

  /** [[quantizeInt8]] flattened to engine-portable scalars for the
    * correctness gate: integer stats plus an md5 digest of the
    * comma-joined quantized values (arrays hash differently across
    * engines; the digest pins every element exactly).
    */
  def quantizeInt8Digest(df: DataFrame, id: Column, vec: Column): DataFrame =
    quantizeInt8(df, id, vec).select(
      col("id"),
      md5(concat_ws(",", col("q").cast("array<string>"))).as("q_md5"),
      array_min(col("q")).as("q_min"),
      array_max(col("q")).as("q_max"),
      aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
      size(filter(col("q"), x => x =!= 0L)).cast("long").as("q_nnz"))

  /** Per-key centroid (mean vector) — cluster prototypes / per-source
    * profile embeddings (the k-means M-step as a standalone op; the
    * E-step is [[Similarity.ivfTopK]]'s broadcast argmax assignment).
    * Output is LONG format (key, pos, mean_v): join-ready for distance
    * scans and oracle-checkable; reassemble with
    * `sort_array(collect_list(struct(pos, mean_v)))` when an array is
    * wanted.
    *
    * Shape: posexplode then one aggregated exchange at (key, dim) grain —
    * partials combine map-side, so shuffle rows are |keys|·dims, not
    * |vectors|·dims. Determinism: each element floors to an integer
    * micro-unit before the sum (the repo's 1e-6 flooring pattern), so
    * the aggregate is order-independent and engine-exact; the mean loses
    * < 1e-6 per element, documented.
    */
  def centroidByKey(df: DataFrame, key: Column, vec: Column): DataFrame =
    df.select(key.as("key"), posexplode(vec.cast("array<double>")).as(Seq("pos", "v")))
      .groupBy(col("key"), col("pos"))
      .agg(
        sum(floor(col("v") * 1e6).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .select(
        col("key"),
        col("pos"),
        (col("__s").cast("double") / 1e6 / col("__n")).as("mean_v"))

  // ---- distributed k-means ----

  /** Distributed Lloyd k-means over the FULL corpus — the at-scale fit
    * path beyond [[Similarity]]'s bounded-sample driver fit (which stays
    * the right tool for index codebooks: a model artifact needs a sample,
    * not a corpus). Here every E-step is a cluster-wide scan and every
    * M-step a (cluster, dim)-grain aggregated exchange, so the fit
    * handles corpora no driver can hold:
    *
    *   - E-step: one pass over the cached quantized corpus through the
    *     codegen'd [[org.apache.spark.sql.graft.NearestCentroid]]
    *     (k×d integer loop per row, centroids plan-time broadcast via
    *     `addReferenceObj` — no join, no HOF interpretation).
    *   - M-step: posexplode → groupBy(list, pos) with map-side partial
    *     sums; the exchange carries ≤ k·d rows per map task, and the
    *     driver collects exactly k·d rows (the bounded model artifact),
    *     never data.
    *
    * Determinism — the reason this is oracle-replayable at all: vectors
    * quantize to a 1e-6 integer grid (floor — no rounding-mode
    * ambiguity), distances are exact BIGINT sums (order-free), argmin
    * ties go to the lowest centroid index, and the new centroid per dim
    * is floor(sum/count) where the division is one correctly-rounded
    * IEEE op on exactly-representable integers (|sum| < 2^53) — every
    * step is bit-identical on any engine, so the whole fit TRAJECTORY
    * replays in unrolled SQL (the BPE-train discipline applied to
    * clustering). Init = the first k vectors in (md5(id), id) order —
    * [[Similarity]]'s replayable total order. Empty clusters keep their
    * previous centroid.
    *
    * Returns per-cluster (list_id, size, inertia) from a final
    * assignment pass — size and inertia are exact integers, so the
    * record pins the full assignment without hashing arrays. The
    * quantized corpus is cached for the `iters` E/M scans and
    * unpersisted before the final pass (which re-reads the source — one
    * extra scan, no app-lifetime cache residue).
    */
  /** The 1e-6-grid quantized frame every k-means surface shares. */
  private def kmQuantize(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(
      id.cast("long").as("__id"),
      transform(vec.cast("array<double>"),
        x => floor(x * lit(1e6)).cast("long")).as("__qv"))

  /** The E/M loop on a quantized frame: caches it for the `iters` scans,
    * unpersists before returning. Returns (centroids, dim). */
  private def kmFit(q: DataFrame, k: Int, iters: Int): (Array[Array[Long]], Int) = {
    import org.apache.spark.sql.graft.VectorFunctions.nearestCentroid
    val cached = q.persist()
    var cents: Array[Array[Long]] =
      cached
        .select(col("__qv"), md5(col("__id").cast("string")).as("__h"), col("__id"))
        .orderBy(col("__h"), col("__id"))
        .limit(k)
        .select("__qv")
        .collect()
        .map(_.getSeq[Long](0).toArray)
    require(cents.length == k, s"kMeans fit: corpus has ${cents.length} < k=$k vectors")
    val d = cents.head.length
    for (_ <- 0 until iters) {
      val stats = cached
        .select(nearestCentroid(col("__qv"), cents.flatten, k, d)
          .bitwiseAND(lit(16383L)).cast("int").as("__list"),
          col("__qv"))
        .select(col("__list"), posexplode(col("__qv")).as(Seq("__pos", "__q")))
        .groupBy(col("__list"), col("__pos"))
        .agg(sum(col("__q")).as("__s"), count(lit(1)).as("__n"))
        .collect() // ≤ k·d rows — the bounded model artifact, never data
      val next = cents.map(_.clone)
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
      }
      cents = next
    }
    cached.unpersist()
    (cents, d)
  }

  /** Fit + final assignment: (id, list_id, dist) per vector, where dist
    * is the exact integer squared grid-distance to the winning centroid.
    * The cluster-membership surface the curation ops compose on. */
  def kMeansAssign(
      df: DataFrame, id: Column, vec: Column, k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.graft.VectorFunctions.nearestCentroid
    val q = kmQuantize(df, id, vec)
    val (cents, d) = kmFit(q, k, iters)
    q.select(
        col("__id").as("id"),
        nearestCentroid(col("__qv"), cents.flatten, k, d).as("__packed"))
      .select(
        col("id"),
        col("__packed").bitwiseAND(lit(16383L)).cast("int").as("list_id"),
        shiftright(col("__packed"), 14).as("dist"))
  }

  def kMeansFitStats(
      df: DataFrame, id: Column, vec: Column, k: Int, iters: Int): DataFrame =
    kMeansAssign(df, id, vec, k, iters)
      .groupBy(col("list_id"))
      .agg(count(lit(1)).as("size"), sum(col("dist")).as("inertia"))

  /** Cluster-balanced subsample — the diversity-preserving curation draw:
    * fit k clusters on the full corpus ([[kMeansAssign]]), then keep the
    * first `n` members of EACH cluster in (md5(id), id) order. Uniform
    * md5 sampling preserves the corpus's cluster imbalance; this keeps
    * the tails (rare clusters survive at full strength, dominant ones
    * are capped) — the standard embedding-space balancing step before
    * mixture weighting. Plan: the assignment scan, then one rank
    * exchange on list_id with per-map-task top-n pruning
    * (WindowGroupLimit — [[Sampling.capPerKey]]'s shape); the md5 order
    * makes the draw engine-replayable like every sampling op here.
    */
  def kMeansBalancedSample(
      df: DataFrame, id: Column, vec: Column, k: Int, iters: Int, n: Int): DataFrame =
    Sampling.capPerKey(
      kMeansAssign(df, id, vec, k, iters)
        .withColumn("__h", md5(col("id").cast("string"))),
      col("list_id"),
      Seq(col("__h"), col("id")),
      n)
      .select(col("id"), col("list_id"))

  // ---- PCA / whitening ----

  /** A trained PCA basis: the artifact is O(dim²) — bounded and
    * corpus-size-independent, like [[Similarity]]'s PQ codebooks.
    * `components(j)` is the j-th principal direction (length `dim`),
    * ordered by descending eigenvalue; `eigenvalues(j)` is the variance
    * along it.
    */
  final case class PcaBasis(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** Fit a k-component PCA basis over an embedding column — the standard
    * preprocessing for SemDeDup-style semantic dedup and ANN index
    * compression.
    *
    * Scale shape: TWO distributed passes, both
    * `RowMatrix` treeAggregates (column summary stats for the mean,
    * then the dim×dim covariance); the corpus never ships to the driver.
    * The eigendecomposition runs on the driver over the dim×dim
    * covariance — O(dim³) work on a 64×64 matrix, constant in corpus
    * size (the same bounded-driver-work posture as PQ codebook
    * training). Sign convention: each component is flipped so its
    * largest-|entry| coordinate is positive, making the basis
    * deterministic across runs and platforms.
    */
  def pcaBasis(df: DataFrame, vec: Column, k: Int): PcaBasis = {
    import org.apache.spark.mllib.linalg.{Vectors => MlVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rows = df
      .select(vec.cast("array<double>").as("v"))
      .rdd
      .map(r => MlVectors.dense(r.getSeq[Double](0).toArray))
    val mat = new RowMatrix(rows)
    val dim = mat.numCols().toInt
    require(k >= 1 && k <= dim, s"k=$k out of range for dim=$dim")
    val mean = mat.computeColumnSummaryStatistics().mean.toArray
    val cov = mat.computeCovariance() // dim×dim local, from one treeAggregate
    val bcov = breeze.linalg.DenseMatrix.tabulate(dim, dim)((i, j) => cov(i, j))
    val es = breeze.linalg.eigSym(bcov) // ascending eigenvalues
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i)).take(k)
    val comps = order.map { j =>
      val c = Array.tabulate(dim)(i => es.eigenvectors(i, j))
      // deterministic sign: largest-|entry| coordinate positive
      val m = c.indices.maxBy(i => (math.abs(c(i)), -i))
      if (c(m) < 0) c.map(-_) else c
    }.toArray
    PcaBasis(mean, comps, order.map(j => math.max(0d, es.eigenvalues(j))).toArray)
  }

  /** Project (and optionally whiten) an embedding column onto a trained
    * basis. Pure per-row projection — no shuffle, k·dim multiplies per
    * row through codegen'd `zip_with`/`aggregate` HOFs; the basis rides
    * into the plan as literals (O(k·dim) plan size, fine for ANN-scale
    * k·dim; at very large bases switch to a broadcast + native
    * expression).
    *
    * Whitening divides each coordinate by √eigenvalue (components with
    * eigenvalue ≤ `eps` pass through unscaled instead of exploding), so
    * downstream cosine/L2 treats every retained direction equally.
    */
  def pcaProject(
      df: DataFrame,
      id: Column,
      vec: Column,
      basis: PcaBasis,
      whiten: Boolean = false,
      eps: Double = 1e-9): DataFrame = {
    val meanLit = array(basis.mean.map(lit): _*)
    val centered = zip_with(vec.cast("array<double>"), meanLit, (a, b) => a - b)
    val coords = basis.components.zipWithIndex.map { case (c, j) =>
      val dot = aggregate(
        zip_with(centered, array(c.map(lit): _*), (a, b) => a * b),
        lit(0.0),
        (acc, x) => acc + x)
      val lam = basis.eigenvalues(j)
      if (whiten && lam > eps) dot / lit(math.sqrt(lam)) else dot
    }
    df.select(id.as("id"), array(coords: _*).as("proj"))
  }

  /** [[pcaProject]] flattened to engine-portable scalars (the
    * quantizeInt8Digest pattern): per-vector digest of micro-unit-floored
    * coordinates plus summary stats — deterministic across runs because
    * the basis itself is (sign convention + deterministic eigensolver).
    */
  def pcaProjectDigest(
      df: DataFrame,
      id: Column,
      vec: Column,
      basis: PcaBasis,
      whiten: Boolean = false): DataFrame =
    pcaProject(df, id, vec, basis, whiten).select(
      col("id"),
      md5(concat_ws(",",
        transform(col("proj"), x => floor(x * 1e6).cast("long")).cast("array<string>")))
        .as("proj_md5"),
      size(col("proj")).cast("long").as("k"),
      floor(aggregate(col("proj"), lit(0.0), (acc, x) => acc + x * x) * 1e6)
        .cast("long").as("sq_norm_micro"))

  /** Matryoshka-style truncation: keep the first `k` dimensions and
    * L2-renormalize — the MRL serving trick (Kusupati et al. 2022) that
    * trades recall for a k/dim memory and dot-product cost cut in ANN
    * retrieval, assuming the encoder was trained with nested losses.
    * Zero-norm prefixes pass through unnormalized (no 0/0 NaN path).
    *
    * Pure per-row projection (slice + one fold + one map, all HOFs over
    * a k-length array) — no shuffle, linear scale-out. Determinism: the
    * norm is a LEFT-TO-RIGHT fold of exact float→double widenings, and
    * both engines fold lists in order, so digest parity is exact; the
    * digest floors to micro-units like [[pcaProjectDigest]].
    */
  /** Embedding-store QA: per-vector squared L2 norm in floored
    * micro-units plus dimension — the pre-flight that catches zero /
    * truncated / un-normalized vectors before they poison cosine math
    * downstream (a zero-norm vector scores 0 against everything and
    * silently vanishes from near-dup output). Left-to-right double fold
    * of exact float widenings, same determinism contract as
    * [[truncateRenorm]]'s digest — the record is engine-exact. Pure
    * projection, no shuffle.
    */
  def normStats(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(
      id.as("vec_id"),
      size(vec).cast("long").as("dim"),
      floor(aggregate(vec.cast("array<double>"), lit(0.0), (acc, x) => acc + x * x) * 1e6)
        .cast("long").as("norm_sq_micro"))

  def truncateRenorm(df: DataFrame, id: Column, vec: Column, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val t = slice(vec.cast("array<double>"), 1, k)
    val norm = sqrt(aggregate(t, lit(0.0), (acc, x) => acc + x * x))
    df.select(
      id.as("id"),
      // bind the norm once per row (the Cols.bindOnce pathology: a bare
      // reference inside the lambda re-folds the norm per element)
      Cols.bindOnce(norm)(n =>
        when(n > 0d, transform(t, x => x / n)).otherwise(t)).as("proj"))
  }

  /** [[truncateRenorm]] flattened to engine-portable scalars (the
    * digest pattern shared with [[pcaProjectDigest]]).
    */
  def truncateRenormDigest(df: DataFrame, id: Column, vec: Column, k: Int): DataFrame =
    truncateRenorm(df, id, vec, k).select(
      col("id"),
      md5(concat_ws(",",
        transform(col("proj"), x => floor(x * 1e6).cast("long")).cast("array<string>")))
        .as("proj_md5"),
      size(col("proj")).cast("long").as("k"),
      floor(aggregate(col("proj"), lit(0.0), (acc, x) => acc + x * x) * 1e6)
        .cast("long").as("sq_norm_micro"))

  // ---- Johnson–Lindenstrauss random projection ----

  /** Deterministic Rademacher (±1) JL sign: +1 iff the first hex nibble
    * of `md5("jl:<j>:<i>")` is < 8 — a fair coin any engine with md5 can
    * replay, so a SQL oracle reproduces the exact projection matrix
    * (the portable-hash discipline of [[graft.ops.Sampling]]).
    */
  private[graft] def jlSign(j: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl:$j:$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) < 8) 1L else -1L
  }

  /** Johnson–Lindenstrauss random projection to `k` dims — the SCALE-path
    * complement to [[pcaBasis]]: where PCA needs a distributed covariance
    * pass + driver eigendecomposition, JL needs NO training at all (the
    * ±1 matrix is hash-derived at plan time), preserves pairwise
    * distances within the JL distortion bound (w.h.p. for
    * k = O(ln N / ε²)), and runs as one codegen'd projection over the
    * corpus — the right tool when 100 TB of embeddings need a cheap
    * dimensionality cut before ANN indexing and nobody wants a fit pass.
    *
    * Exactness: elements floor to integer micro-units FIRST
    * (`floor(x·1e6)` as long), then each output coord is an exact
    * INTEGER sum `Σᵢ ±xqᵢ` — order-independent and engine-portable, so
    * the record is oracle-exact (the [[centroidByKey]] discipline). The
    * conventional 1/√k scale is left to the caller: it is a constant
    * monotone factor, and keeping the record integral keeps it exact.
    *
    * Returns (id, pos, y_micro), one row per output coordinate. Scale:
    * pure per-row HOF expressions (the k×dim sign matrix is a plan-time
    * literal, k·dim ≤ a few thousand) + one `posexplode`; no shuffle, no
    * fit, no driver data path.
    */
  def jlProject(df: DataFrame, id: Column, vec: Column, dim: Int, k: Int): DataFrame = {
    require(k >= 1 && dim >= 1, "need k >= 1 and dim >= 1")
    val signsLit = array((0 until k).map(j =>
      array((0 until dim).map(i => lit(jlSign(j, i))): _*)): _*)
    df.select(
        id.as("id"),
        transform(vec.cast("array<double>"), x => floor(x * 1e6).cast("long")).as("__xq"))
      .select(
        col("id"),
        posexplode(transform(signsLit, row =>
          aggregate(zip_with(col("__xq"), row, (x, s) => x * s), lit(0L), (acc, t) => acc + t)))
          .as(Seq("pos", "y_micro")))
  }
}
