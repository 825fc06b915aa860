package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra–Gries heavy-hitters summary (mergeable form, Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): at most `k` counters per buffer;
  * inserting an untracked token when full decrements every counter instead
  * (dropping zeros), merging sums counterwise and re-truncates by
  * subtracting the (k+1)-largest count.
  *
  * Guarantees (n = stream length): every token with true frequency
  * > n/(k+1) is present in the summary, and each reported estimate è
  * satisfies true − n/(k+1) ≤ è ≤ true. Those bounds survive arbitrary
  * merge trees, which is exactly what a 100 TB groupBy needs — the exact
  * per-(group, token) count query shuffles the whole token table; this
  * ships ≤ k counters per group per map task, same contract as the HLL and
  * quantile-sketch scale twins. Estimates are summary-dependent → the
  * driver gate is rows-only; the error bounds are asserted in
  * HeavyHittersSpec against the exact counts.
  *
  * IN = token; OUT = top-k (token, estimate) sorted by estimate desc then
  * token asc (deterministic for a given merge tree).
  */
class HeavyHittersAggregator(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {

  require(k > 0, s"HeavyHittersAggregator: k must be positive, got $k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long],
                      tok: String): mutable.Map[String, Long] = {
    b.get(tok) match {
      case Some(c) => b.update(tok, c + 1)
      case None if b.size < k => b.update(tok, 1L)
      case None =>
        // decrement-all step: one tracked unit per counter and the new
        // token's single unit are all discharged together
        val dead = mutable.ArrayBuffer.empty[String]
        b.keysIterator.foreach { t =>
          val c = b(t) - 1
          if (c <= 0) dead += t else b.update(t, c)
        }
        dead.foreach(b.remove)
    }
    b
  }

  override def merge(x: mutable.Map[String, Long],
                     y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    y.foreach { case (t, c) => x.update(t, x.getOrElse(t, 0L) + c) }
    if (x.size > k) {
      // subtract the (k+1)-largest count from everything, drop non-positive:
      // leaves at most k strictly-positive counters
      val cut = x.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer.empty[String]
      x.keysIterator.foreach { t =>
        val c = x(t) - cut
        if (c <= 0) dead += t else x.update(t, c)
      }
      dead.foreach(x.remove)
    }
    x
  }

  override def finish(b: mutable.Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
