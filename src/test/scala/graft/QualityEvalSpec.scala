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

  test("the AUC Window's input is the bounded milli-logit histogram: " +
    "fixture cardinality sits far under the declared 5e6 score-range bound") {
    import org.apache.spark.sql.functions._
    val docs = graft.etl.Tables.documents(spark, "/root/testdata/sf0.001")
    // the declared bound (aucFromScored Scaladoc): |lm| <= 500 * maxTokens,
    // where the admission gate caps n_chars at 10000 ⇒ <= 5000 tokens
    val maxTokens = 5000L
    val hist = graft.ext.TextAnalysis.tokens(col("text"))
    val lm = QualityModel.aucVsRules(docs) // forces the plan shape compiles
    lm.columns shouldBe Array("n_pos", "n_neg", "auc")
    val card = graft.etl.Tables.fanOut(docs)
      .select(org.apache.spark.sql.GraftColumnBridge.column(
        org.apache.spark.sql.graft.LrLogit(
          org.apache.spark.sql.GraftColumnBridge.expression(hist),
          QualityModel.Dim)).getField("logit_milli").as("lm"))
      .agg(countDistinct(col("lm")).as("d"),
        max(abs(col("lm"))).as("mx")).head()
    card.getLong(0) should be <= (2 * 500 * maxTokens + 1)
    card.getLong(1) should be <= (500L * maxTokens)
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
