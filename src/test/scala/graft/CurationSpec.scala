package graft

import graft.ext.Curation
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CurationSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    // 40 varied tokens: passes every gopher threshold
    (0L, (1 to 40).map(i => s"word$i").mkString(" "), "en", "s0"),
    // 10 tokens: fails the n_tokens >= 30 rule
    (1L, (1 to 10).map(i => s"word$i").mkString(" "), "en", "s0"),
    // 40 tokens but one token is 20/40 of the doc: fails repetition rule
    (2L, ((1 to 20).map(_ => "spam") ++ (1 to 20).map(i => s"w$i")).mkString(" "),
      "de", "s1")
  ).toDF("doc_id", "text", "lang", "source")

  test("gopherRules: thresholds separate clean, short, and repetitive docs") {
    val out = Curation.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(0L).getAs[Long]("keep_flag") shouldBe 1L
    out(1L).getAs[Long]("keep_flag") shouldBe 0L
    out(2L).getAs[Long]("keep_flag") shouldBe 0L
    out(2L).getAs[Double]("top_token_ratio") shouldBe 0.5 +- 1e-9
    out(0L).getAs[Long]("n_tokens") shouldBe 40L
  }

  test("stratifiedSample: deterministic across runs, subset of input") {
    val a = Curation.stratifiedSample(docs).as[(Long, String, String)].collect().toSet
    val b = Curation.stratifiedSample(docs).as[(Long, String, String)].collect().toSet
    a shouldBe b
    a.map(_._1).subsetOf(Set(0L, 1L, 2L)) shouldBe true
  }

  test("budgetPack: per-lang cumsum never exceeds budget, best-quality-first") {
    val out = Curation.budgetPack(docs, budget = 45L).collect()
    out.foreach(r => r.getAs[Long]("cum_tokens") should be <= 45L)
    // en: doc 0 (40 tokens, higher quality) admitted first; doc 1 would
    // push the en total to 50 > 45, so only one en row survives
    out.count(_.getAs[String]("lang") == "en") shouldBe 1
    out.find(_.getAs[String]("lang") == "en").get.getAs[Long]("doc_id") shouldBe 0L
  }
}
