package graft

import graft.ext.Similarity
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PQ-ADC contract: deterministic output, exact-cosine re-rank scores,
  * and recall@k against the exact brute-force twin — approximation lives
  * ONLY in the shortlist, so with shortlist ≫ k the planted structure of
  * the fixture must be recovered almost entirely. */
class PqSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def asSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("recall@10 vs the exact brute-force twin >= 0.8 on the fixture") {
    val pq = asSets(Similarity.pqTopK(emb, nQueries = 8, k = 10, shortlist = 100))
    val exact = asSets(Similarity.bruteForceTopKAgg(emb, nQueries = 8, k = 10))
    exact.keySet shouldBe pq.keySet
    val recalls = exact.map { case (q, ids) =>
      (pq(q) intersect ids).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    withClue(s"per-query recalls: $recalls") { mean should be >= 0.8 }
  }

  test("IVF-PQ recall@10 >= 0.8 on planted clusters; scores are exact " +
    "re-rank cosines on the fixture") {
    // IVF's contract is data in its regime (neighbors concentrated in few
    // buckets) — plant it like IvfSpec does rather than gate on the
    // near-random fixture where any nprobe/ncentroids scan caps ~0.5
    val rnd = new scala.util.Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(10)(unit())
    val planted = (0 until 500).map { i =>
      val c = centers(i / 50)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val exact = asSets(Similarity.bruteForceTopKAgg(planted, nQueries = 8, k = 10))
    val sets = asSets(Similarity.ivfPqTopK(planted, nQueries = 8, k = 10,
      shortlist = 100, centroidEvery = 50, nprobe = 3))
    exact.keySet shouldBe sets.keySet
    val recalls = exact.map { case (q, ids) =>
      (sets(q) intersect ids).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    withClue(s"per-query recalls: $recalls") { mean should be >= 0.8 }
    // score exactness holds on ANY data — the fine stage re-ranks with
    // true vectors, so every emitted cosine matches brute force
    val brute = Similarity.bruteForceTopKAgg(emb, nQueries = 4, k = 10)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    Similarity.ivfPqTopK(emb, nQueries = 4, k = 10)
      .as[(Long, Long, Double, Long)].collect().foreach { case (q, v, c, _) =>
        brute.get((q, v)).foreach(bc => c shouldBe bc +- 5e-7)
      }
  }

  test("deterministic across runs; ranks contiguous from 1; re-rank scores " +
    "are exact cosines (match the brute-force score for shared pairs)") {
    val a = Similarity.pqTopK(emb, nQueries = 4, k = 5, shortlist = 30)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val b = Similarity.pqTopK(emb, nQueries = 4, k = 5, shortlist = 30)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    a shouldBe b
    a.groupBy(_._1).values.foreach { rows =>
      rows.map(_._4).sorted shouldBe (1L to rows.length)
    }
    val brute = Similarity.bruteForceTopKAgg(emb, nQueries = 4, k = 5)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    // pq emits round(cosine, 6); brute emits the raw double
    a.foreach { case (q, v, c, _) =>
      brute.get((q, v)).foreach(bc => c shouldBe bc +- 5e-7)
    }
  }
}
