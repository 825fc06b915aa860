package graft

import org.apache.spark.sql.graft.WinnowFingerprints
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class WinnowFingerprintsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def fp(s: String) = WinnowFingerprints.fingerprints(s, 8, 4).toSet

  test("winnowing guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    val common = "the quick brown fox" // 19 >= 8+4-1
    val a = fp(s"PREFIX AAA $common SUFFIX BBB")
    val b = fp(s"other text entirely $common and more")
    (a intersect b) should not be empty
  }

  test("disjoint texts share nothing; identical texts share everything") {
    fp("abcdefghijklmnop") intersect fp("qrstuvwxyz123456") shouldBe empty
    fp("same document text here") shouldBe fp("same document text here")
  }

  test("rolling hash ≡ direct polynomial evaluation") {
    val s = "rolling hash check 0123456789"
    val direct = (0 to s.length - 8).map { i =>
      s.substring(i, i + 8).foldLeft(0L)((h, c) =>
        (h * WinnowFingerprints.B + c) % WinnowFingerprints.P)
    }
    // window minima of the directly-computed grams
    val expect = direct.sliding(4).map(_.min).toSeq.distinct.toSet
    fp(s) shouldBe expect
  }

  test("short input degenerates to one whole-string hash") {
    WinnowFingerprints.fingerprints("tiny", 8, 4).length shouldBe 1
  }

  test("SQL surface + codegen path via the session") {
    val r = spark.sql(
      "SELECT winnow_fingerprints('the quick brown fox jumps') AS f")
      .collect().head.getSeq[Long](0)
    r.toSet shouldBe fp("the quick brown fox jumps")
    r should not be empty
  }
}
