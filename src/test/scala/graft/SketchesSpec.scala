package graft

import graft.ext.{Similarity, Sketches}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** HLL sketch invariants, the exact-integer Gram matrix vs a hand-rolled
  * reference, and power-iteration alignment on a planted dominant
  * direction. */
class SketchesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hllRegisters: buckets within [0, 64), rho within [1, 27], at most " +
    "one register per bucket, register count bounded by distinct texts") {
    val d = Seq((0L, "aa bb"), (1L, "cc dd"), (2L, "ee ff"), (3L, "aa bb"))
      .toDF("doc_id", "text")
    val regs = Sketches.hllRegisters(d).as[(Long, Long)].collect()
    regs.length should be <= 3 // 3 distinct texts
    regs.map(_._1).distinct.length shouldBe regs.length
    regs.foreach { case (bucket, r) =>
      bucket should (be >= 0L and be < 64L)
      r should (be >= 1L and be <= 27L)
    }
  }

  test("hllEstimate: deterministic across runs; raw estimate within the " +
    "small-m error envelope on the fixture corpus") {
    val a = Sketches.hllEstimate(docs)
      .as[(Double, Long, Long, Double)].head()
    val b = Sketches.hllEstimate(docs)
      .as[(Double, Long, Long, Double)].head()
    a shouldBe b // bit-identical re-run (no libm, exact harmonic sum)
    a._1 should be > 0.0
    a._2 should be > 0L
    a._3 shouldBe (64L - (64L - a._3)) // n_zero_regs self-consistent
    // raw HLL (no linear-counting correction, m = 64) is biased high at
    // n ~ m; the envelope just pins the wiring, not sketch theory
    math.abs(a._4) should be <= 0.8
    a._4 shouldBe (a._1 - a._2.toDouble) / a._2.toDouble
  }

  test("cms: estimates never undercount, are exact for the fixture's top " +
    "tokens when the table is sparse, and the counter mass per row equals " +
    "the token stream length") {
    val est = Sketches.cmsEstimates(docs)
      .as[(String, Long, Long, Long)].collect()
    est.length shouldBe 10
    est.foreach { case (_, exact, e, over) =>
      over should be >= 0L // the CMS one-sided guarantee
      e shouldBe exact + over
    }
    val cms = Sketches.cmsCounts(docs).as[(Long, Long, Long)].collect()
    val nTokens = docs.selectExpr("sum(size(split(text, ' ')))")
      .as[Long].head()
    // every occurrence lands in exactly one cell per row
    cms.groupBy(_._1).values.foreach(_.map(_._3).sum shouldBe nTokens)
    cms.map(_._1).distinct.sorted shouldBe Seq(0L, 1L, 2L, 3L)
    cms.foreach { case (_, c, _) => c should (be >= 0L and be < 256L) }
  }

  test("mergeability: shard-merged HLL registers and CMS counters equal " +
    "the whole-corpus sketches exactly") {
    val direct = Sketches.hllRegisters(docs).as[(Long, Long)].collect().toSet
    val merged = Sketches.hllMerge(docs).as[(Long, Long)].collect().toSet
    merged shouldBe direct
    val cmsDirect = Sketches.cmsCounts(docs).as[(Long, Long, Long)].collect().toSet
    val cmsMerged = Sketches.cmsMerge(docs).as[(Long, Long, Long)].collect().toSet
    cmsMerged shouldBe cmsDirect
  }

  test("hllIntersect: inclusion-exclusion overlap lands within the " +
    "compounded small-m envelope; union estimate consistent") {
    val r = Sketches.hllIntersect(docs).collect().head
    val (estA, estB, estU, estI, exact) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4))
    // identity, not just tolerance: the output must BE the algebra
    estI shouldBe (estA + estB - estU)
    // union of the cohorts can't estimate below either input's registers
    // (max-merge only raises registers, so Z only shrinks)
    estU should be >= math.max(estA, estB)
    // three compounded ±1.04/√64 ≈ 13% estimates against an overlap ~1/3
    // of the union: generous envelope, still catches a broken merge or a
    // wrong sign in the algebra immediately
    math.abs(estI - exact) / exact.toDouble should be < 0.75
  }

  test("gramMatrix: matches a hand-computed quantized Gram on a tiny " +
    "fixture, upper triangle only") {
    val vecs = Seq(
      Array(1.0f, 0.5f, -0.25f, 0.0f),
      Array(0.5f, 1.0f, 0.0f, -1.0f),
      Array(0.0f, 0.25f, 0.75f, 0.5f))
    val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = Similarity.gramMatrix(emb, d = 4)
      .as[(Long, Long, Long)].collect()
      .map { case (i, j, s) => (i, j) -> s }.toMap
    val q = vecs.map(_.map(f => math.floor(f.toDouble * 1024.0).toLong))
    val expected = (for {
      i <- 0 until 4; j <- i until 4
    } yield (i.toLong, j.toLong) -> q.map(v => v(i) * v(j)).sum).toMap
    got shouldBe expected
  }

  test("pcaTop: recovers a planted dominant direction and a positive " +
    "eigenvalue; deterministic sign") {
    val dom = Array(1.0f, 1.0f, 0.0f, 0.0f)
    val minor = Array(0.0f, 0.0f, 0.1f, -0.1f)
    val rows = (0 until 40).map(i => (i.toLong, dom)) ++
      (40 until 44).map(i => (i.toLong, minor))
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.pcaTop(emb, d = 4)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    out.length shouldBe 4
    val v = out.map(_._2)
    val expected = Array(1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0.0, 0.0)
    val cos = v.zip(expected).map { case (x, y) => x * y }.sum
    math.abs(cos) should be > 0.99
    v(0) should be > 0.0 // sign convention: largest-|.| component positive
    out.head._3 should be > 0.0 // eigenvalue
  }
}
