package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Every graft native function must be reachable from plain SQL via the
  * injected FunctionRegistry — the full surface, not just the three the
  * sql_surface query demonstrates. Values are pinned against the DataFrame
  * bridge forms elsewhere; here we check registration + sane output. */
class SqlFunctionRegistrySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("all native functions callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS sic,
        |  fvec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |           array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS fdot,
        |  dvec_dot(array(1D, 2D), array(3D, 4D)) AS ddot,
        |  size(winnow_fingerprints('the quick brown fox jumps over the lazy dog')) AS wf,
        |  size(hashed_shingles(array('a', 'b', 'c'), 2)) AS hs,
        |  size(md5_shingle_hashes(array('a', 'b', 'c'), 2)) AS ms,
        |  simhash64(array('a', 'b', 'a')) AS sh,
        |  size(sorted_pairs(array(3L, 1L, 2L))) AS sp,
        |  sign_sketch(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 8) AS ss,
        |  size(quantize_int8(array(CAST(0.5 AS FLOAT), CAST(-1.0 AS FLOAT))).qvec) AS qi,
        |  lr_logit(array('a', 'b', 'c'), 64).n_tokens AS ll,
        |  zorder_key(array(3, 5)) AS zk,
        |  hilbert_key(array(8, 6)) AS hk
        |""".stripMargin).collect().head
    r.getAs[Long]("sic") shouldBe 2L
    r.getAs[Double]("fdot") shouldBe 11.0 +- 1e-6
    r.getAs[Double]("ddot") shouldBe 11.0 +- 1e-12
    r.getAs[Int]("wf") should be > 0
    r.getAs[Int]("hs") shouldBe 2
    r.getAs[Int]("ms") shouldBe 2
    r.getAs[Int]("sp") shouldBe 3 // 3 ids -> 3 unordered pairs
    r.getAs[Int]("qi") shouldBe 2
    r.getAs[Long]("ll") shouldBe 3L
    r.getAs[Long]("zk") shouldBe 39L // interleave(x=3, y=5) = 0b100111
    r.getAs[Long]("hk") shouldBe 124L // xy2d(8, 6) at order 31
  }

  test("malformed inputs fail loudly: null pair ids, mismatched dot lengths") {
    // sorted_pairs over an array with a null element must error, not emit
    // phantom doc_id-0 pairs
    val e1 = intercept[Exception] {
      spark.sql("SELECT sorted_pairs(array(1L, CAST(NULL AS BIGINT), 3L))").collect()
    }
    e1.getMessage should include("null element")
    // dot products reject length mismatch instead of silently truncating
    val e2 = intercept[Exception] {
      spark.sql("SELECT fvec_dot(array(CAST(1 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)))").collect()
    }
    e2.getMessage should include("lengths differ")
    val e3 = intercept[Exception] {
      spark.sql("SELECT dvec_dot(array(1D), array(1D, 2D))").collect()
    }
    e3.getMessage should include("lengths differ")
  }

  test("static int parameters must be literals") {
    val err = intercept[Exception] {
      spark.sql("SELECT hashed_shingles(array('a','b'), 1 + col) FROM (SELECT 1 AS col)")
        .collect()
    }
    err.getMessage should include("literal")
  }
}
