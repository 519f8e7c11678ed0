package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy hitters — the bounded-memory approximate top-k that
  * replaces "exact count then rank" when the key space itself won't fit
  * (token vocabularies, URLs, user agents at 100 TB). The buffer is at
  * most `k` counters no matter how many distinct keys stream through;
  * partials merge associatively (Agarwal et al. 2012, "Mergeable
  * Summaries": summing matched counters then subtracting the (k+1)-th
  * largest keeps the bound), so map-side combine works like any built-in
  * aggregate.
  *
  * Deterministic guarantees the gate spec checks (not probabilistic —
  * unlike bloom/HLL there is no seed):
  *   - every key with true frequency > N/(k+1) is present in the output;
  *   - each reported count is an UNDER-estimate by at most N/(k+1).
  *
  * The exact companion is a plain groupBy count + TopN (which every
  * oracle-checked t_doc_freq-style query already uses); this is the
  * declared sketch path, like percentile_approx next to the exact
  * quantiles.
  */
class HeavyHitters(k: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1, "need k >= 1 counters")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      // full and unseen: decrement everyone (the classic MG step — this
      // is where the ≤ N/(k+1) undercount comes from), dropping zeros
      case None => m.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from all, drop non-positive:
      // exactly k survive and the error bound telescopes across merges
      val cut = summed.valuesIterator.toArray.sortBy(-_).apply(k)
      summed.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (key, c) => (-c, key) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object HeavyHitters {
  /** Aggregate column: the ≤ `k` Misra–Gries counters of a string column,
    * as an array of (item, est) structs sorted by estimate descending. */
  def heavyHitters(col: Column, k: Int): Column =
    udaf(new HeavyHitters(k), Encoders.STRING).apply(col)
}
