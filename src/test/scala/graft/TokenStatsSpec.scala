package graft

import graft.ext.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The one-pass codegen'd TokenStats expression must agree exactly with
  * the composed size/array_distinct/aggregate/filter column formulation it
  * replaced (same integers → same exact double ratios). */
class TokenStatsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenStats ≡ the composed-builtins formulation, bit-exact") {
    val docs = Seq(
      (0L, "the of and to in a is for on it", "en", "s"), // all stopwords
      (1L, "unique tokens only here now", "en", "s"),     // no stopwords
      (2L, "a a a a a", "en", "s"),                       // one repeated token
      (3L, "héllo wörld héllo ñ", "de", "s"),             // multi-byte chars
      (4L, "x", "fr", "s"),                               // single token
      (5L, (1 to 500).map(i => s"w${i % 23}").mkString(" "), "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.tokenStats(docs)
      .as[(Long, String, Long, Long, Double, Double)].collect().toSet
    val ref = TextAnalysis.tokenStatsViaHof(docs)
      .as[(Long, String, Long, Long, Double, Double)].collect().toSet
    got shouldBe ref
  }

  test("SQL-registered token_stats computes the same counts") {
    val r = spark.sql(
      "SELECT token_stats(array('the', 'cat', 'the', 'mat')) AS ts").collect().head
      .getStruct(0)
    r.getLong(0) shouldBe 4L // n_tokens
    r.getLong(1) shouldBe 3L // n_distinct
    r.getLong(2) shouldBe 12L // sum_len
    r.getLong(3) shouldBe 2L // top_c ("the" twice)
    r.getLong(4) shouldBe 2L // n_stopword ("the" twice)
  }

  test("null tokens are rejected loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT token_stats(array('a', CAST(NULL AS STRING)))").collect()
    }
    e.getMessage should include("null token")
  }
}
