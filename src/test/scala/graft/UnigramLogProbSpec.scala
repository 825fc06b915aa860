package graft

import graft.ext.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Hand-computed check of the corpus-self-trained unigram LM scorer:
  * p(t) = c(t)/N over all docs, doc score = mean ln p over token
  * positions (tf-weighted). */
class UnigramLogProbSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unigramLogProb matches hand-computed corpus probabilities") {
    // corpus: N = 6 tokens, c(a)=3, c(b)=2, c(c)=1
    val docs = Seq(
      (1L, "a a a b", "en", "s"),
      (2L, "b c", "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.unigramLogProb(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    out(1L)._1 shouldBe 4L
    out(2L)._1 shouldBe 2L
    val (lpA, lpB, lpC) =
      (math.log(3.0 / 6), math.log(2.0 / 6), math.log(1.0 / 6))
    out(1L)._2 shouldBe (3 * lpA + lpB) / 4 +- 1e-5
    out(2L)._2 shouldBe (lpB + lpC) / 2 +- 1e-5
    // the doc made of frequent tokens scores higher (less negative)
    out(1L)._2 should be > out(2L)._2
  }

  test("deterministic across runs and invariant to input partitioning") {
    val docs = (0L until 120L).map { i =>
      (i, (0L to i % 11).map(j => s"t${(i * 7 + j) % 23}").mkString(" "),
        "en", "s")
    }.toDF("doc_id", "text", "lang", "source")
    val a = TextAnalysis.unigramLogProb(docs)
      .as[(Long, Long, Double)].collect().toSet
    val b = TextAnalysis.unigramLogProb(docs.repartition(7))
      .as[(Long, Long, Double)].collect().toSet
    a shouldBe b
    a.size shouldBe 120
  }
}
