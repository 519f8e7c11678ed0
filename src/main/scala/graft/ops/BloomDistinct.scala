package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory distinct-count estimate via a Bloom filter — the typed
  * `Aggregator` formulation of reference A8 (`gmall-network-flow/.../app/
  * UniqueVisitorApp2.java:93-167`: a hand-rolled polynomial hash over a
  * Redis bitmap, counting first-seen userIds). Spark-first differences:
  * the bitmap is operator state inside the aggregation buffer (no external
  * KV store), it merges associatively (map-side partial aggregation works —
  * OR of bitmaps), and the final count corrects for collisions with the
  * standard fill-ratio estimator  n ≈ -(m/k)·ln(1 − X/m)  instead of the
  * reference's "count only on first-set" undercount.
  *
  * `approx_count_distinct` (HLL++) remains the default scale path; this
  * exists for bloom-parity semantics and as the library's typed-Aggregator
  * extension point. Buffer = m bits regardless of cardinality.
  */
class BloomDistinct(numBits: Int, numHashes: Int) extends Aggregator[Long, Array[Long], Long] {
  require(Integer.bitCount(numBits) == 1, "numBits must be a power of two")
  private val mask = numBits - 1

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  private def setBit(buf: Array[Long], x: Long): Unit = {
    // double hashing h1 + i*h2 (Kirsch–Mitzenmacher); splitmix64 finalizers
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    val h1 = (z ^ (z >>> 31)).toInt
    var w = x * 0x94d049bb133111ebL + 0x2545f4914f6cdd1dL
    w = (w ^ (w >>> 27)) * 0xff51afd7ed558ccdL
    val h2 = ((w ^ (w >>> 33)).toInt | 1) // odd stride
    var i = 0
    while (i < numHashes) {
      val bit = (h1 + i * h2) & mask
      buf(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  override def reduce(buf: Array[Long], x: Long): Array[Long] = { setBit(buf, x); buf }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var set = 0L
    var i = 0
    while (i < buf.length) { set += java.lang.Long.bitCount(buf(i)); i += 1 }
    if (set == 0) 0L
    else if (set == numBits) Long.MaxValue // saturated: size the filter up
    else math.round(-(numBits.toDouble / numHashes) *
      math.log1p(-(set.toDouble / numBits)))
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object BloomDistinct {
  /** Aggregate column: bloom-estimated distinct count of a long column.
    * Defaults sized for ~100k distinct at <1% collision error. */
  def bloomDistinct(col: Column, numBits: Int = 1 << 20, numHashes: Int = 4): Column =
    udaf(new BloomDistinct(numBits, numHashes), Encoders.scalaLong).apply(col)
}
