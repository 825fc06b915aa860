package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for the injected band-join rewrite: for random
  * integer sets (dense around bin boundaries, negatives included) and a
  * random band width, the rewritten `abs(a-b) <= W` join must equal the
  * brute-force cross filter exactly. The rule fires on every such join in
  * this session (extensions are wired), so this fuzzes the rewrite itself. */
class BandedRangeJoinPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("banded rewrite ≡ brute force over random sets and widths") {
    import spark.implicits._
    val genVals = Gen.listOfN(12, Gen.chooseNum(-60L, 60L))
    val genW = Gen.chooseNum(1L, 25L)
    val prop = Prop.forAllNoShrink(genVals, genVals, genW) { (ls, rs, w) =>
      val left = ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("lid", "lv")
      val right = rs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("rid", "rv")
      val got = left.join(right, abs($"lv" - $"rv") <= w)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val want = (for {
        (lv, li) <- ls.zipWithIndex
        (rv, ri) <- rs.zipWithIndex
        if math.abs(lv - rv) <= w
      } yield (li.toLong, ri.toLong)).toSet
      got == want
    }
    PropCheck.check(prop, minSuccessful = 40, tag = "BandedRangeJoinPropSpec#1")
  }

  test("fractional banded rewrite ≡ brute force over random doubles and widths") {
    import spark.implicits._
    // quarter-steps land values exactly ON bin edges for widths like 0.25
    // and 0.5 — the boundary-heavy distribution the floor(x/W) binning must
    // survive; plain doubles in [-6, 6] cover the generic case
    val genVal = Gen.oneOf(
      Gen.chooseNum(-24, 24).map(_ * 0.25),
      Gen.chooseNum(-6.0, 6.0))
    val genVals = Gen.listOfN(12, genVal)
    val genW = Gen.oneOf(Gen.const(0.25), Gen.const(0.5),
      Gen.chooseNum(0.1, 3.0))
    val prop = Prop.forAllNoShrink(genVals, genVals, genW) { (ls, rs, w) =>
      val left = ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("lid", "lv")
      val right = rs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("rid", "rv")
      val got = left.join(right, abs($"lv" - $"rv") <= w)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val want = (for {
        (lv, li) <- ls.zipWithIndex
        (rv, ri) <- rs.zipWithIndex
        if math.abs(lv - rv) <= w
      } yield (li.toLong, ri.toLong)).toSet
      got == want
    }
    PropCheck.check(prop, minSuccessful = 40, tag = "BandedRangeJoinPropSpec#2")
  }
}
