package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** d×d Gram-matrix accumulation as ONE typed Aggregator (SURVEY X3
  * extension — the covariance/PCA input a training pipeline computes over
  * its embedding table): IN = a quantized integer vector, BUF/OUT = the
  * flattened d×d matrix as Array[Long] (upper triangle populated; the
  * lower stays 0 and is filtered after the explode).
  *
  * Why an Aggregator and not explode-pairs + groupBy: the declarative form
  * generates n·d²/2 (i, j, x_i·x_j) rows through the hash-aggregate — the
  * exchange is still only d² keys thanks to partial aggregation, but every
  * product becomes a row object. Here each input row is a tight d²/2-step
  * primitive-array loop, the exchange carries ONE d²-word partial per map
  * task (same posture as [[BitsetAggregator]]), and the result is a single
  * row. Integer math end to end: quantized components are bounded by 2^11
  * (floor(f·2^10) of unit-scale floats), so each product fits 2^22 and the
  * BIGINT sums overflow only past ~2^41 rows — document-scale safe, and
  * overflow would need a deliberately adversarial corpus.
  */
class GramAggregator(d: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(d > 0, s"d must be positive: $d")

  override def zero: Array[Long] = new Array[Long](d * d)

  override def reduce(b: Array[Long], q: Seq[Long]): Array[Long] = {
    require(q.length == d, s"vector length ${q.length} != $d")
    val a = q.toArray
    var i = 0
    while (i < d) {
      val qi = a(i)
      if (qi != 0L) {
        val row = i * d
        var j = i
        while (j < d) { b(row + j) += qi * a(j); j += 1 }
      }
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
