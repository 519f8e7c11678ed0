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
      transform(v, x =>
        greatest(lit(-127L), least(lit(127L), floor(x * scale + lit(0.5))))).as("q"),
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
}
