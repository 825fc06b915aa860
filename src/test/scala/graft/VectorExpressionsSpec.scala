package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VectorExpressionsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("fvec_dot ≡ interpreted aggregate(zip_with) fold, bit-exact (codegen path)") {
    import spark.implicits._
    val vec = Gen.listOfN(16, Gen.chooseNum(-10f, 10f))
    val prop = Prop.forAllNoShrink(Gen.listOfN(20, Gen.zip(vec, vec))) { pairs =>
      val df = pairs.toDF("a", "b")
      val rows = df.select(
        expr("fvec_dot(a, b)").as("fast"),
        aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("ref")).collect()
      rows.forall(r => r.getDouble(0) == r.getDouble(1)) // EXACT, not approx
    }
    PropCheck.check(prop, minSuccessful = 20, tag = "VectorExpressionsSpec#1")
  }

  test("quantize_int8 expression ≡ the HOF transform/round formulation") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array.tabulate(64)(i => math.sin(i * 0.37).toFloat).toSeq),
      (1L, Seq(-1.5f, 0.5f, 0.25f, -0.125f)), // rounding ties, both signs
      (2L, Seq(0.0f, 0.0f, 0.0f)),            // zero vector → NULLs
      (3L, Seq(127.0f, -254.0f))
    ).toDF("vec_id", "embedding")
    val fast = graft.ext.Similarity.quantizeInt8(vecs)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)).map(_.toString))).toMap
    val ref = graft.ext.Similarity.quantizeInt8ViaHof(vecs)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)).map(_.toString))).toMap
    fast shouldBe ref
  }

  test("sign_sketch: deterministic, near-duplicate vectors collide, opposites differ") {
    import spark.implicits._
    val base = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val nearDup = base.map(x => x * 1.001f)
    val opposite = base.map(x => -x)
    val df = Seq(("base", base.toSeq), ("dup", nearDup.toSeq), ("opp", opposite.toSeq))
      .toDF("name", "v")
    val sk = df.select(col("name"),
      graft.ext.Similarity.signSketch(col("v"), 8, 64).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sk("base") shouldBe sk("dup")
    sk("opp") shouldBe ~sk("base") & 0xFFL // all 8 plane signs flip
    // stable across evaluations
    df.select(graft.ext.Similarity.signSketch(col("v"), 8, 64)).collect()
      .map(_.getLong(0)).toSet should contain(sk("base"))
  }
}
