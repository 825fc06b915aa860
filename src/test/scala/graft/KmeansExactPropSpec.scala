package graft

import graft.ext.Similarity
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the oracle-exact Lloyd rounds: the DataFrame plan
  * (broadcast candidate join, min-struct argmin, integer-quantized
  * moments) must equal a SEQUENTIAL Scala model running the same
  * quantized arithmetic — including argmin ties (the dyadic fixtures
  * collide at integer qdist, where the (qdist, cluster) order must
  * break to the LOWER cluster id on both) and clusters that empty out
  * mid-run. The DuckDB oracle (`emb_kmeans`) pins cross-engine
  * exactness at sf0.01; this pins plan-vs-model determinism on hostile
  * shapes. Comparison is integer-exact by construction. */
class KmeansExactPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val quant = 1.0e15

  /** The sequential twin of kmeansExact's arithmetic. */
  private def model(vecs: Seq[(Long, Seq[Float])], k: Int, iters: Int)
      : Map[Long, (Long, Long)] = {
    var assigned: Map[Long, Long] =
      vecs.map { case (id, _) => id -> id % k }.toMap
    var qdist: Map[Long, Long] = Map.empty
    for (_ <- 0 until iters) {
      // centroid: per (cluster, dim), floor(x·1e9) summed as Long,
      // divided back as sumDouble / (n·1e9)
      val cents: Map[Long, Array[Double]] =
        vecs.groupBy { case (id, _) => assigned(id) }.map { case (c, vs) =>
          val dim = vs.head._2.length
          val sums = Array.fill(dim)(0L)
          vs.foreach { case (_, v) =>
            var d = 0
            while (d < dim) {
              sums(d) += math.floor(v(d).toDouble * 1.0e9).toLong
              d += 1
            }
          }
          c -> sums.map(s => s.toDouble / (vs.length.toDouble * 1.0e9))
        }
      // assign: argmin over clusters of the integer-quantized squared
      // distance; (qdist, cluster) ties break to the LOWER cluster id
      val next = vecs.map { case (id, v) =>
        val best = cents.toSeq.map { case (c, cv) =>
          var q = 0L
          var d = 0
          while (d < v.length) {
            val diff = v(d).toDouble - cv(d)
            q += math.floor(diff * diff * quant).toLong
            d += 1
          }
          (q, c)
        }.minBy(identity)
        (id, best._2, best._1)
      }
      assigned = next.map(t => t._1 -> t._2).toMap
      qdist = next.map(t => t._1 -> t._3).toMap
    }
    // keys materialize to a Seq BEFORE mapping to qdist: equal distances
    // (duplicate vectors) must not collapse in a Set before the sum
    assigned.groupBy { case (_, c) => c }.map { case (c, m) =>
      c -> ((m.size.toLong, m.keys.toSeq.map(qdist).sum))
    }
  }

  // dyadic values (k/8) in a narrow range force frequent exact ties at
  // integer qdist; tiny dims keep the k-candidate fan-out cheap
  private val genCase: Gen[(List[(Long, Seq[Float])], Int)] = for {
    n <- Gen.choose(3, 14)
    dim <- Gen.choose(1, 4)
    k <- Gen.choose(2, 4)
    vals <- Gen.listOfN(n,
      Gen.listOfN(dim, Gen.choose(-8, 8).map(_ / 8.0f)))
  } yield (vals.zipWithIndex.map { case (v, i) =>
    (i.toLong, v: Seq[Float]) }, k)

  test("kmeansExact ≡ the sequential quantized model on tie-heavy dyadic " +
    "fixtures, including emptied clusters (property)") {
    val prop = Prop.forAllNoShrink(genCase) { case (vecs, k) =>
      import spark.implicits._
      val df = vecs.toDF("vec_id", "embedding")
      val got = Similarity.kmeansExact(df, k = k, iters = 2).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      got == model(vecs, k, iters = 2)
    }
    PropCheck.check(prop, minSuccessful = 25, tag = "KmeansExactPropSpec#1")
  }
}
