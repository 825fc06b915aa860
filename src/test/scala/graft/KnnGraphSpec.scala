package graft

import graft.ext.Similarity
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class KnnGraphSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("knnGraphExact: every vector gets exactly k neighbors, ranked by " +
    "cosine desc with contiguous ranks") {
    val n = emb.count()
    val g = Similarity.knnGraphExact(emb, k = 5).collect()
    g.length shouldBe n * 5
    g.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(3))
      byRank.map(_.getLong(3)).toSeq shouldBe (1L to 5L)
      val cos = byRank.map(_.getDouble(2)).toSeq
      cos.zip(cos.tail).foreach { case (a, b) => a should be >= b }
      // no self-loop
      rows.foreach(r => r.getLong(1) should not be r.getLong(0))
    }
  }

  test("knnGraph: recall vs the exact graph >= 0.8 on seeded planted " +
    "clusters — the quantitative gate for the rows-only query") {
    // same planted regime as IvfSpec's recall gate: 10 tight clusters of
    // 50, block-assigned ids so every-50th kmeans seeding starts one
    // centroid per planted cluster; true neighbors then concentrate in the
    // home bucket and nprobe=2 covers boundary cases
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val nn = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nn)
    }
    val centers = Array.fill(10)(unit())
    val planted = (0 until 500).map { i =>
      val c = centers(i / 50)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.knnGraphExact(planted, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.knnGraph(planted, k = 5, centroidEvery = 50,
      nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("knnGraph plan: candidates meet in an EQUI-join on the bucket key — " +
    "no cartesian/nested-loop pair blow-up, no per-source Window sort") {
    val g = Similarity.knnGraph(emb, k = 5)
    val plan = g.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
    // the exact baseline, by contrast, IS the declared all-pairs form
    val exactPlan = Similarity.knnGraphExact(emb, k = 5)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("CartesianProduct") ||
      exactPlan.contains("BroadcastNestedLoopJoin"), exactPlan)
  }

  test("knnGraph: home bucket is always probed (probe element 0 == " +
    "assignment), so every vector has neighbors when its bucket does") {
    val g = Similarity.knnGraph(emb, k = 3, centroidEvery = 100, nprobe = 2)
      .collect()
    // every source id present (500-vector fixture, buckets of ~100 — no
    // vector can be alone in its probed buckets)
    g.map(_.getLong(0)).distinct.length shouldBe emb.count()
    g.groupBy(_.getLong(0)).values.foreach { rows =>
      val ranks = rows.map(_.getLong(3)).sorted.toSeq
      ranks shouldBe (1L to ranks.length)
    }
  }

  test("NearestCentroids: element 0 equals NearestCentroid's assignment; " +
    "ids ascend by distance with the id tie-break") {
    import org.apache.spark.sql.functions._
    val probeIds = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.graft.NearestCentroids(
        org.apache.spark.sql.GraftColumnBridge.expression(col("embedding")),
        Seq(0L, 1L, 2L),
        Seq(Seq.fill(64)(1.0f), Seq.fill(64)(-1.0f),
          (0 until 64).map(d => if (d < 32) 1.0f else -1.0f)),
        nprobe = 2))
    val one = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.graft.NearestCentroid(
        org.apache.spark.sql.GraftColumnBridge.expression(col("embedding")),
        Seq(0L, 1L, 2L),
        Seq(Seq.fill(64)(1.0f), Seq.fill(64)(-1.0f),
          (0 until 64).map(d => if (d < 32) 1.0f else -1.0f))))
    val rows = emb.select(probeIds.as("p"), one.as("c")).collect()
    rows.foreach { r =>
      val p = r.getSeq[Long](0)
      p.length shouldBe 2
      p.head shouldBe r.getLong(1)
      p.distinct.length shouldBe p.length
    }
  }
}
