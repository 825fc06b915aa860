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

  test("ivfAssign ≡ the crossJoin+min-struct formulation it replaced, and is shuffle/join/agg-free") {
    import org.apache.spark.sql.functions._
    // same default iters as ivfAssign's internal kmeans — deterministic
    // seeding + exact arithmetic → identical centroids across the two runs
    val centroids = Similarity.kmeansCentroids(emb, centroidEvery = 25)
    val assigned = Similarity.ivfAssign(emb, 25)
    // reference model: broadcast crossJoin + min(struct(cdist, id)) — the
    // round-4 formulation (full-corpus shuffle per call) kept here as the
    // equivalence oracle only
    val c = broadcast(centroids.withColumn("cnorm", Similarity.norm(col("cvec"))))
    val ref = emb.withColumn("vnorm", Similarity.norm(col("embedding")))
      .crossJoin(c)
      .select(col("vec_id"), col("centroid_id"),
        (-(Similarity.dot(col("embedding"), col("cvec")) /
          (col("vnorm") * col("cnorm")))).as("cdist"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("cdist"), col("centroid_id"))).as("best"))
      .select(col("vec_id"), col("best.centroid_id").as("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = assigned.select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // kmeansCentroids is re-run inside ivfAssign on the same input → same
    // centroids (deterministic seeding + exact arithmetic), so assignments
    // must agree exactly
    fast shouldBe ref
    // assignment is a pure projection: no join, no aggregate anywhere in
    // its plan (the only allowed exchange is fanOut's fixture repartition)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("kmeansExact: a mixed %k init converges to the planted partition " +
    "in 2 rounds with zero final inertia; the assign join is BROADCAST") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // ids 0-2 at A, 3-5 at B: the %2 init MIXES them (c0={0,2,4},
    // c1={1,3,5}); round-1 centroids tilt toward their majority point, so
    // round 1 already reassigns by true cluster and round 2 lands the
    // centroids exactly on A and B — final quantized inertia is 0
    val a = Seq.fill(4)(0.0f)
    val b = Seq.fill(4)(10.0f)
    val df = (0L to 5L).map(i => (i, if (i < 3) a else b))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansExact(df, k = 2, iters = 2)
    out.orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
      Array((0L, 3L, 0L), (1L, 3L, 0L))
    // the n×k candidate expansion must be a broadcast of the k-row
    // centroid table, never a cartesian shuffle of the corpus
    val plan = out.queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("kmeansExact: every vector keeps exactly one cluster; ids stay " +
    "within the %k init range on the parquet fixture") {
    val out = Similarity.kmeansExact(emb).collect()
    out.map(_.getAs[Long]("n")).sum shouldBe emb.count()
    all(out.map(_.getAs[Long]("cluster"))) should (be >= 0L and be < 8L)
  }

  test("jlProject: 16 scalar rows per vector, norms preserved in expectation") {
    import org.apache.spark.sql.functions._
    val n = emb.count()
    val proj = Similarity.jlProject(emb)
    proj.count() shouldBe n * 16
    proj.select("dim").distinct().count() shouldBe 16L
    // JL: E[||proj(v)||²] = ||v||² — the fixture average must sit near 1
    val ratio = proj
      .groupBy("vec_id").agg(sum(col("pval") * col("pval")).as("pn"))
      .join(emb.select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("vn")), "vec_id")
      .agg(avg(col("pn") / col("vn"))).head().getDouble(0)
    ratio should (be > 0.6 and be < 1.4)
  }

  test("jlProject is linear: proj(2v) = 2·proj(v)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val v = (0 until 64).map(d => (d % 7).toFloat - 3.0f)
    val two = v.map(_ * 2)
    val df = Seq((0L, v), (1L, two)).toDF("vec_id", "embedding")
    val out = Similarity.jlProject(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    (0 until 16).foreach { k =>
      out((1L, k.toLong)) shouldBe (2 * out((0L, k.toLong)) +- 1e-5)
    }
  }

  test("jlTopK: k ranked results per query; shortlist recall beats random") {
    val k = 5
    val got = Similarity.jlTopK(emb, nQueries = 4, k = k, shortlist = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.size shouldBe 4 * k
    val exact = Similarity.bruteForceTopK(emb, nQueries = 4, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16-dim ±1 JL is a coarse filter: an 80-of-500 shortlist recovering
    // ≥40% of the true top-5 is ~3× a random shortlist's expectation
    // (16%) — the re-rank stage is what makes the pattern usable
    val recall = got.intersect(exact).size.toDouble / exact.size
    recall should be > 0.4
  }

  test("ivfTopK: recall vs brute force >= 0.8 at nprobe=3 on seeded " +
    "planted clusters — the quantitative quality gate for the rows-only " +
    "query") {
    // IVF's contract is data in its regime: neighbors concentrated in few
    // buckets. The parquet fixture is NOT that (cluster signal is weak —
    // top cosines ~0.35 with near-random labels, so any nprobe=3/10 scan
    // caps around 0.5 recall there); plant it explicitly instead, like
    // jlTopK's ~3×-random spec: 10 tight clusters of 50 around seeded
    // random unit centers, block-assigned ids so the every-50th kmeans
    // seeding starts one centroid per planted cluster.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(10)(unit())
    val planted = (0 until 500).map { i =>
      val c = centers(i / 50) // block layout: ids 0-49 cluster 0, …
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(planted, nQueries = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(planted, nQueries = 8, k = 10,
      centroidEvery = 50, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    recall should be >= 0.8
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
