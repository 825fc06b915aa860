package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The injected optimizer rule [[graft.plans.BandedRangeJoinRule]] must turn a
  * plain `abs(a - b) <= W` theta join into a banded equi join (no nested-loop
  * fan-out) without changing its result — including negative values, where
  * truncating division makes bin 0 twice as wide. */
class BandedRangeJoinRuleSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w = 10L
  // boundary-heavy values: multiples of W, just-inside/outside, negatives
  private val lVals = Seq(-25L, -20L, -11L, -10L, -9L, -1L, 0L, 1L, 9L, 10L, 19L, 20L, 31L)
  private val rVals = Seq(-30L, -21L, -20L, -10L, 0L, 5L, 10L, 11L, 20L, 29L, 30L, 41L)

  test("abs-band join rewrites to an equi join and matches brute force") {
    val left = lVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
    val right = rVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
    val joined = left.join(right, abs($"lv" - $"rv") <= w)
      .select($"lid", $"rid").orderBy($"lid", $"rid")

    val got = joined.as[(Long, Long)].collect().toSeq
    val want = (for {
      (lv, li) <- lVals.zipWithIndex
      (rv, ri) <- rVals.zipWithIndex
      if math.abs(lv - rv) <= w
    } yield (li.toLong, ri.toLong)).sorted
    got shouldBe want

    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should include regex "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
  }

  test("band conjunct alongside an equi key still rewrites, result unchanged") {
    val left = Seq((1L, 100L, "a"), (2L, 109L, "a"), (3L, 200L, "b"), (4L, 111L, "a"))
      .toDF("lid", "lv", "k")
    val right = Seq((10L, 105L, "a"), (11L, 90L, "a"), (12L, 205L, "b"), (13L, 105L, "b"))
      .toDF("rid", "rv", "k2")
    val joined = left.join(right, $"k" === $"k2" && abs($"lv" - $"rv") <= w)
      .select($"lid", $"rid").orderBy($"lid", $"rid")
    joined.as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L), (4L, 10L))
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("two-sided BETWEEN spelling rewrites the same way") {
    val left = lVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
    val right = rVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
    val joined = left.join(right,
        $"rv" >= $"lv" - w && $"rv" <= $"lv" + w)
      .select($"lid", $"rid").orderBy($"lid", $"rid")
    val want = (for {
      (lv, li) <- lVals.zipWithIndex
      (rv, ri) <- rVals.zipWithIndex
      if math.abs(lv - rv) <= w
    } yield (li.toLong, ri.toLong)).sorted
    joined.as[(Long, Long)].collect().toSeq shouldBe want
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("SQL BETWEEN over temp views rewrites too") {
    lVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
      .createOrReplaceTempView("band_l")
    rVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
      .createOrReplaceTempView("band_r")
    val joined = spark.sql(
      s"SELECT lid, rid FROM band_l JOIN band_r ON rv BETWEEN lv - $w AND lv + $w " +
        "ORDER BY lid, rid")
    val want = (for {
      (lv, li) <- lVals.zipWithIndex
      (rv, ri) <- rVals.zipWithIndex
      if math.abs(lv - rv) <= w
    } yield (li.toLong, ri.toLong)).sorted
    joined.as[(Long, Long)].collect().toSeq shouldBe want
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("asymmetric bounds band at the wider width, result exact") {
    val left = lVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
    val right = rVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
    // rv in [lv - 3, lv + 10]
    val joined = left.join(right, $"rv" >= $"lv" - 3 && $"rv" <= $"lv" + 10)
      .select($"lid", $"rid").orderBy($"lid", $"rid")
    val want = (for {
      (lv, li) <- lVals.zipWithIndex
      (rv, ri) <- rVals.zipWithIndex
      if rv >= lv - 3 && rv <= lv + 10
    } yield (li.toLong, ri.toLong)).sorted
    joined.as[(Long, Long)].collect().toSeq shouldBe want
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("strict-inequality bounds band too, result exact") {
    val left = lVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
    val right = rVals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
    val joined = left.join(right, $"rv" > $"lv" - w && $"rv" < $"lv" + w)
      .select($"lid", $"rid").orderBy($"lid", $"rid")
    val want = (for {
      (lv, li) <- lVals.zipWithIndex
      (rv, ri) <- rVals.zipWithIndex
      if rv > lv - w && rv < lv + w
    } yield (li.toLong, ri.toLong)).sorted
    joined.as[(Long, Long)].collect().toSeq shouldBe want
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("timestamp BETWEEN ± INTERVAL bands on epoch micros") {
    import java.sql.Timestamp
    val base = 1704067200000L
    def ts(sec: Long) = new Timestamp(base + sec * 1000L)
    val lSecs = Seq(0L, 5L, 9L, 10L, 11L, 20L, 3600L)
    val rSecs = Seq(1L, 10L, 19L, 21L, 3599L, 7200L)
    val left = lSecs.zipWithIndex.map { case (s, i) => (i.toLong, ts(s)) }
      .toDF("lid", "lts")
    val right = rSecs.zipWithIndex.map { case (s, i) => (i.toLong, ts(s)) }
      .toDF("rid", "rts")
    val joined = left.join(right,
        expr("rts BETWEEN lts - INTERVAL 10 SECONDS AND lts + INTERVAL 10 SECONDS"))
      .select($"lid", $"rid").orderBy($"lid", $"rid")
    val want = (for {
      (l, li) <- lSecs.zipWithIndex
      (r, ri) <- rSecs.zipWithIndex
      if math.abs(l - r) <= 10
    } yield (li.toLong, ri.toLong)).sorted
    joined.as[(Long, Long)].collect().toSeq shouldBe want
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("double-typed abs band rewrites via floor(x/W) binning, result exact") {
    // boundary-heavy doubles: exact multiples of W=0.25, just-inside/outside,
    // negatives, and values straddling bin edges
    val lDs = Seq(-1.0, -0.76, -0.75, -0.5, -0.26, 0.0, 0.24, 0.25, 0.5, 1.01, 2.5)
    val rDs = Seq(-1.25, -1.0, -0.51, -0.25, 0.0, 0.25, 0.26, 0.49, 0.75, 1.25, 2.26)
    val left = lDs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
    val right = rDs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
    val joined = left.join(right, abs($"lv" - $"rv") <= 0.25)
      .select($"lid", $"rid").orderBy($"lid", $"rid")
    val want = (for {
      (lv, li) <- lDs.zipWithIndex
      (rv, ri) <- rDs.zipWithIndex
      if math.abs(lv - rv) <= 0.25
    } yield (li.toLong, ri.toLong)).sorted
    joined.as[(Long, Long)].collect().toSeq shouldBe want
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should include regex "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
  }

  test("double BETWEEN spelling rewrites too, alongside an equi key") {
    val left = Seq((1L, 1.0, "a"), (2L, 2.4, "a"), (3L, 5.0, "b"))
      .toDF("lid", "lv", "k")
    val right = Seq((10L, 1.3, "a"), (11L, 0.4, "a"), (12L, 5.2, "b"), (13L, 1.3, "b"))
      .toDF("rid", "rv", "k2")
    val joined = left.join(right,
        $"k" === $"k2" && $"rv" >= $"lv" - 0.5 && $"rv" <= $"lv" + 0.5)
      .select($"lid", $"rid").orderBy($"lid", $"rid")
    joined.as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 10L), (3L, 12L))
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("NaN/zero-width fractional bands are left untouched (still correct)") {
    val left = Seq((1L, 1.05), (2L, 3.0), (3L, Double.NaN)).toDF("lid", "lv")
    val right = Seq((10L, 1.0), (11L, 9.0), (12L, Double.NaN)).toDF("rid", "rv")
    // zero width → no rewrite (floor-div by 0 would be unsound); NaN rows
    // never match regardless of the plan shape
    val joined = left.join(right, abs($"lv" - $"rv") <= 0.0)
      .select($"lid", $"rid")
    joined.as[(Long, Long)].collect().toSeq shouldBe Seq.empty
    // and a real fractional width keeps NaN rows unmatched after rewrite
    val banded = left.join(right, abs($"lv" - $"rv") <= 0.1)
      .select($"lid", $"rid")
    banded.as[(Long, Long)].collect().toSeq shouldBe Seq((1L, 10L))
  }
}
