package graft

import graft.ext.{Dedup, PrefixJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

class PrefixJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      BigDecimal(r.getDouble(2)).setScale(12, BigDecimal.RoundingMode.HALF_UP)))
      .toSet

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight", "en"),
    (1L, "the quick brown fox jumps over the lazy cat tonight", "en"), // near-dup of 0
    (2L, "completely different words about spark catalyst engines here", "en"),
    (3L, "the quick brown fox jumps over the lazy dog tonight", "en"), // exact dup of 0
    (4L, "the quick brown fox", "en"), // big length skew vs 0
    (5L, "der schnelle braune fuchs springt heute nacht", "de"), // other lang
    (6L, "the quick brown fox jumps over the lazy dog tonight", "de") // same text, other lang
  ).toDF("doc_id", "text", "lang")

  test("prefix-filtered pairs == all-pairs posting join on the planted corpus") {
    for (t <- Seq(0.2, 0.5, 0.8)) {
      val brute = pairsOf(Dedup.ngramJaccardPairs(docs, t))
      val pref = pairsOf(PrefixJoin.jaccardPairs(docs, t))
      withClue(s"threshold $t: ") { pref shouldBe brute }
    }
    // sanity on the content, not just agreement: the exact dup scores 1.0
    // and crosses langs never pair
    val out = PrefixJoin.jaccardPairs(docs, 0.5).collect()
    out.find(r => r.getLong(0) == 0L && r.getLong(1) == 3L)
      .get.getDouble(2) shouldBe 1.0
    out.map(r => (r.getLong(0), r.getLong(1))) should not contain ((0L, 6L))
  }

  test("soundness fuzz: random corpora agree with brute force at several " +
    "thresholds (float ceilings never drop a true pair)") {
    val rnd = new Random(20260813L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    // small vocabulary on purpose: heavy token sharing maximizes pairs
    // whose Jaccard lands ON decision boundaries like 1/3, 1/2, 2/3
    val rows = (0L until 60L).map { id =>
      val n = 2 + rnd.nextInt(9)
      val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (id, text, if (rnd.nextInt(4) == 0) "de" else "en")
    }
    val df = rows.toDF("doc_id", "text", "lang")
    for (t <- Seq(0.25, 1.0 / 3.0, 0.5, 0.75)) {
      val brute = pairsOf(Dedup.ngramJaccardPairs(df, t))
      val pref = pairsOf(PrefixJoin.jaccardPairs(df, t))
      withClue(s"threshold $t: ") { pref shouldBe brute }
    }
  }

  test("the filters actually prune: prefix candidates are a strict subset " +
    "of the posting join's shared-token pairs") {
    val fixture = graft.etl.Tables.documents(spark, "/root/testdata/sf0.001")
    val d = fixture.select(col("doc_id"), col("lang"),
      array_distinct(split(col("text"), " ")).as("toks"))
    val post = d.select(col("doc_id"), col("lang"),
      explode(col("toks")).as("tok"))
    val postingPairs = post.as("a").join(post.as("b"),
        col("a.tok") === col("b.tok") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val trueCount = PrefixJoin.jaccardPairs(fixture, 0.2).count()
    val nCands =
      PrefixJoin.candidates(PrefixJoin.orderedSets(fixture), 0.2).count()
    // completeness (>= every verified pair) AND effectiveness (fewer
    // verifications than the posting join would schedule)
    nCands should be >= trueCount
    nCands should be < postingPairs
  }
}
