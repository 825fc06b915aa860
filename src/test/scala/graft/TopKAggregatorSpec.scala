package graft

import graft.ext.Similarity
import graft.functions.{ScoredId, TopKAggregator}
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.collection.mutable.ArrayBuffer

class TopKAggregatorSpec extends AnyFunSuite with Matchers {

  private def groundTruth(xs: Seq[ScoredId], k: Int): Seq[ScoredId] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  test("property: reduce/merge under arbitrary splits ≡ sort-take") {
    val gen = for {
      xs <- Gen.listOf(Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(-1.0, 1.0)))
      k <- Gen.chooseNum(1, 8)
      splitAt <- Gen.chooseNum(0, xs.size)
    } yield (xs.map((ScoredId.apply _).tupled), k, splitAt)
    val prop = Prop.forAllNoShrink(gen) { case (xs, k, splitAt) =>
      val agg = new TopKAggregator(k)
      val (l, r) = xs.splitAt(splitAt)
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(ArrayBuffer.empty[ScoredId])(agg.reduce)
      agg.finish(agg.merge(bufL, bufR)) == groundTruth(xs, k)
    }
    PropCheck.check(prop, minSuccessful = 200, tag = "TopKAggregatorSpec#1")
  }

  test("bounded buffer: partial state never exceeds 2k+1 entries") {
    val agg = new TopKAggregator(5)
    val buf = (1 to 1000).map(i => ScoredId(i.toLong, i / 1000.0))
      .foldLeft(agg.zero)(agg.reduce)
    buf.size should be <= 11
  }

  test("Spark equivalence: bruteForceTopKAgg ≡ bruteForceTopK on fixtures") {
    val spark = TestSpark.spark
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.bruteForceTopK(emb, nQueries = 4, k = 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Similarity.bruteForceTopKAgg(emb, nQueries = 4, k = 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    a shouldBe b
    a.size shouldBe 20
  }
}
