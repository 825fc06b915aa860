package graft

import graft.ext.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class NgramCountsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("ngramCounts: hand-computed trigrams, cutoff, document frequency") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),       // trigrams: tqb qbf bfj fjx? → 3
      (2L, "the quick brown dog"),             // tqb qbd? → 2
      (3L, "the quick brown fox runs"),        // tqb qbf bfr? → 3
      (4L, "short one"),                       // < 3 tokens → none
      (5L, "the quick brown fox jumps")        // dup of 1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramCounts(docs, minCount = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // "the quick brown" appears in docs 1,2,3,5 → n=4, n_docs=4
    out(("the", "quick", "brown")) shouldBe ((4L, 4L))
    // "quick brown fox" in 1,3,5 → n=3, n_docs=3
    out(("quick", "brown", "fox")) shouldBe ((3L, 3L))
    // "brown fox jumps" in 1,5 → n=2, n_docs=2
    out(("brown", "fox", "jumps")) shouldBe ((2L, 2L))
    // singleton trigrams are cut
    out.keySet.exists(_ == (("fox", "jumps", "runs"))) shouldBe false
    out.keySet should have size 3
  }

  test("ngramCounts: n counts instances, n_docs counts documents") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    // "a b c" ×3, "b c a" ×2, "c a b" ×2 — all in the SAME doc
    val out = TextAnalysis.ngramCounts(docs, minCount = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    out(("a", "b", "c")) shouldBe ((3L, 1L))
    out(("b", "c", "a")) shouldBe ((2L, 1L))
    out(("c", "a", "b")) shouldBe ((2L, 1L))
  }
}
