package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Bounded-heap top-k typed Aggregator (SURVEY §4.3 / X3): per-group top-k
  * without a global sort. `orderBy(desc(score)).limit(k)` plans
  * TakeOrderedAndProject which is already O(n log k) per partition, but a
  * *grouped* top-k (k neighbors per query vector) via a Window + row_number
  * sorts every group fully; this Aggregator keeps only k candidates per
  * group in the partial buffers, so at 100 TB each map task ships k rows per
  * group to the exchange instead of the whole similarity matrix.
  *
  * IN = (id, score); OUT = top-k (id, score) sorted desc by score then asc
  * id for deterministic output.
  */
final case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, ArrayBuffer[ScoredId], Seq[ScoredId]] {

  override def zero: ArrayBuffer[ScoredId] = ArrayBuffer.empty

  private def ord(s: ScoredId): (Double, Long) = (-s.score, s.id)

  private def trim(b: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] =
    if (b.length <= k) b
    else {
      val kept = b.sortBy(ord).take(k)
      b.clear(); b ++= kept; b
    }

  override def reduce(b: ArrayBuffer[ScoredId], a: ScoredId): ArrayBuffer[ScoredId] = {
    b += a
    // amortize: only sort+trim when the buffer doubles past k
    if (b.length > 2 * k) trim(b) else b
  }

  override def merge(x: ArrayBuffer[ScoredId], y: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] =
    trim(x ++= y)

  override def finish(b: ArrayBuffer[ScoredId]): Seq[ScoredId] =
    b.sortBy(ord).take(k).toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[ScoredId]] =
    Encoders.kryo[ArrayBuffer[ScoredId]]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
