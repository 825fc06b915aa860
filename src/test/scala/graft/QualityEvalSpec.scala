package graft

import graft.ext.QualityModel
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The rank-statistic math behind text_quality_auc /
  * text_quality_calibration, checked against the O(n²) pair-count
  * definition of AUC: P(score⁺ > score⁻) + ½·P(score⁺ = score⁻). */
class QualityEvalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def pairCountAuc(rows: Seq[(Long, Long)]): Double = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size.toDouble * neg.size.toDouble)
  }

  private def sparkAuc(rows: Seq[(Long, Long)]): (Long, Long, Double) = {
    import spark.implicits._
    val r = QualityModel.aucFromScored(rows.toDF("lm", "keep_flag")).head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("AUC ≡ pair counting: separation, ties, interleaved") {
    // perfect separation → 1.0
    sparkAuc(Seq((10L, 1L), (20L, 1L), (1L, 0L), (2L, 0L))) shouldBe
      ((2L, 2L, 1.0))
    // all scores tied → 0.5 exactly (mid-rank convention)
    sparkAuc(Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L)))._3 shouldBe 0.5
    // interleaved with partial ties
    val mixed = Seq((1L, 0L), (2L, 1L), (2L, 0L), (3L, 1L), (3L, 0L),
      (4L, 1L), (-7L, 0L), (0L, 1L))
    sparkAuc(mixed)._3 shouldBe pairCountAuc(mixed)
    // randomized fuzz: 3 deterministic seeds, vs the O(n²) reference
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val rows = Seq.fill(60)(
        (rnd.nextInt(21).toLong - 10L, rnd.nextInt(2).toLong))
      sparkAuc(rows)._3 shouldBe pairCountAuc(rows)
    }
  }

  test("calibration: bins, counts, exact means, floor at negatives") {
    import spark.implicits._
    val rows = Seq((-700L, 0L), (-300L, 0L), (-1L, 0L), (0L, 1L),
      (499L, 0L), (500L, 1L), (999L, 1L))
    val out = QualityModel
      .calibrationFromScored(rows.toDF("lm", "keep_flag"), 500)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    out(-2L) shouldBe ((1L, 0L, -0.7, 0.0))           // floor(-700/500) = -2
    out(-1L) shouldBe ((2L, 0L, (-301.0) / 2000.0, 0.0))
    out(0L) shouldBe ((2L, 1L, 499.0 / 2000.0, 0.5))
    out(1L) shouldBe ((2L, 2L, 1499.0 / 2000.0, 1.0))
    out.keySet shouldBe Set(-2L, -1L, 0L, 1L)
  }
}
