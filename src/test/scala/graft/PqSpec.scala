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
