package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise float-vector sum + count — the k-means mean recomputation
  * as ONE aggregation: each partial buffer is a single (dim doubles, n)
  * pair per cluster, so a Lloyd round shuffles clusters × dim doubles and
  * nothing else. The posexplode → groupBy(cluster, dim) formulation this
  * replaces in the Lloyd loop blew every vector up into dim rows and paid
  * a second exchange to regroup the per-dim means back into vectors
  * ([[graft.ext.Similarity.labelCentroids]] keeps that shape — it is the
  * oracle-checked DECIMAL-exact query; this aggregator is the iterate-fast
  * internal path where double summation is fine because k-means centroids
  * are re-derived each round anyway).
  *
  * Buffer/result sums are null/empty until the first vector fixes the
  * dimension; vectors of mismatched dimension error (same contract as
  * fvec_dot).
  */
final case class VecSum(sums: Seq[Double], n: Long)

class VecSumAggregator extends Aggregator[Seq[Float], VecSum, VecSum] {

  override def zero: VecSum = VecSum(Seq.empty, 0L)

  private def add(acc: Seq[Double], v: Seq[Double]): Seq[Double] =
    if (acc.isEmpty) v
    else {
      require(acc.length == v.length,
        s"vec_sum: vector lengths differ (${acc.length} vs ${v.length})")
      val out = acc.toArray
      var i = 0
      while (i < out.length) { out(i) += v(i); i += 1 }
      out.toIndexedSeq
    }

  override def reduce(b: VecSum, a: Seq[Float]): VecSum =
    VecSum(add(b.sums, a.map(_.toDouble)), b.n + 1)

  override def merge(x: VecSum, y: VecSum): VecSum =
    VecSum(add(x.sums, y.sums), x.n + y.n)

  override def finish(r: VecSum): VecSum = r

  override def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
  override def outputEncoder: Encoder[VecSum] = Encoders.product[VecSum]
}
