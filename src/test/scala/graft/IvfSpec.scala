package graft

import graft.ext.Similarity
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class IvfSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("kmeansCentroids: Lloyd iterations yield <= seed-count 64-dim centroids") {
    val c = Similarity.kmeansCentroids(emb, centroidEvery = 25, iters = 2).collect()
    val nSeeds = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 25 === 0).count()
    c.length should be <= nSeeds.toInt
    c.length should be > 0
    all(c.map(_.getSeq[Float](1).length)) shouldBe 64
  }

  test("ivfAssign: every vector lands in exactly one bucket") {
    val n = emb.count()
    val assigned = Similarity.ivfAssign(emb, 25)
    assigned.count() shouldBe n
    assigned.select("vec_id").distinct().count() shouldBe n
  }

  test("ivfTopK: k results per query, ranked by cosine desc") {
    val out = Similarity.ivfTopK(emb, nQueries = 3, k = 5).collect()
    out.length shouldBe 15
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(3))
      byRank.map(_.getLong(3)).toSeq shouldBe (1L to 5L)
      // cosine non-increasing with rank
      val cos = byRank.map(_.getDouble(2)).toSeq
      cos.zip(cos.tail).foreach { case (a, b) => a should be >= b }
    }
  }
}
