package graft

import graft.functions.HeavyHittersAggregator
import graft.ext.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.collection.mutable

/** Misra–Gries guarantees, asserted against exact counts: every token with
  * true frequency > n/(k+1) appears in the summary, and every reported
  * estimate è obeys true − n/(k+1) ≤ è ≤ true — across both the sequential
  * reduce path and arbitrary merges (the distributed shape). */
class HeavyHittersSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 8

  private def exact(tokens: Seq[String]): Map[String, Long] =
    tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def assertBounds(tokens: Seq[String],
                           got: Map[String, Long]): Unit = {
    val n = tokens.size.toLong
    val truth = exact(tokens)
    val slack = n / (k + 1)
    truth.foreach { case (t, c) =>
      if (c > slack) {
        withClue(s"heavy hitter $t (true $c > n/(k+1) = $slack) missing: ") {
          got.contains(t) shouldBe true
        }
      }
    }
    got.foreach { case (t, est) =>
      val c = truth.getOrElse(t, 0L)
      withClue(s"$t est $est vs true $c (slack $slack): ") {
        est should be <= c
        est should be >= c - slack
      }
    }
  }

  // zipf-ish skewed stream: token "hot" ~30%, then a long tail
  private def skewed(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.30) "hot"
      else if (r < 0.45) "warm"
      else if (r < 0.55) "mild"
      else s"tail${rnd.nextInt(200)}"
    }
  }

  test("sequential reduce keeps MG bounds on a skewed stream") {
    val agg = new HeavyHittersAggregator(k)
    val toks = skewed(20000, seed = 1)
    val buf = toks.foldLeft(agg.zero)(agg.reduce)
    assertBounds(toks, agg.finish(buf).toMap)
  }

  test("arbitrary merge trees keep MG bounds") {
    val agg = new HeavyHittersAggregator(k)
    val toks = skewed(30000, seed = 2)
    // 7 uneven chunks, merged pairwise then into one — a lopsided tree
    val chunks = toks.grouped(toks.size / 7 + 1).toSeq
    val bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    val merged = bufs.reduce { (a, b) =>
      agg.merge(a, mutable.Map(b.toSeq: _*)) }
    assertBounds(toks, agg.finish(merged).toMap)
    // top-1 of a 30% token must surface first
    agg.finish(merged).head._1 shouldBe "hot"
  }

  test("heavyHittersExact equals the brute-force heavy-hitter set with exact counts") {
    import org.apache.spark.sql.functions.{col, explode, split => fsplit, count, lit}
    val kk = 6
    // skewed corpus per lang: a few tokens above 1/(k+1), long tail below
    val docs = (0L until 240L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      val rnd = new scala.util.Random(i * 7919 + lang.hashCode)
      val text = (1 to 25).map { _ =>
        val r = rnd.nextDouble()
        if (r < 0.25) s"hot_$lang"
        else if (r < 0.45) "shared"
        else s"tail${rnd.nextInt(300)}"
      }.mkString(" ")
      (i, text, lang, "s")
    }.toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.heavyHittersExact(docs, kk)
      .as[(String, String, Long)].collect().toSet
    val toks = docs.select(col("lang"),
      explode(fsplit(col("text"), " ")).as("token"))
    val totals = toks.groupBy("lang").count().as[(String, Long)].collect().toMap
    val want = toks.groupBy("lang", "token").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .filter { case (l, _, n) => n > totals(l).toDouble / (kk + 1) }
      .toSet
    want should not be empty
    got shouldBe want
  }

  test("distributed heavyHittersPerLang surfaces the planted hot token per lang") {
    val docs = (0L until 400L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      val hot = if (lang == "en") "alpha" else "beta"
      val text = (1 to 20).map(j =>
        if (j <= 8) hot else s"w${(i * 31 + j) % 97}").mkString(" ")
      (i, text, lang, "s")
    }.toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.heavyHittersPerLang(docs, k)
      .as[(String, Long, String, Long)].collect()
    out.filter(_._1 == "en").minBy(_._2)._3 shouldBe "alpha"
    out.filter(_._1 == "de").minBy(_._2)._3 shouldBe "beta"
    // 40% tokens: estimate within n/(k+1) of truth (n = 4000 per lang)
    val enEst = out.find(r => r._1 == "en" && r._3 == "alpha").get._4
    enEst should be <= 1600L
    enEst should be >= 1600L - (4000L / (k + 1))
  }
}
