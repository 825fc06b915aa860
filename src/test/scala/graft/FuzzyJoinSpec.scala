package graft

import graft.ext.FuzzyJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PassJoin edit-distance near-dup: the blocked pipeline must equal the
  * all-pairs brute force EXACTLY (the segment blocking is sound, so this
  * is an equivalence, not a recall bound). */
class FuzzyJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteForce(docs: org.apache.spark.sql.DataFrame, tau: Int) = {
    val s = docs.select(col("doc_id"),
        substring(lower(regexp_replace(col("text"), "[^A-Za-z ]", "")), 1, 64)
          .as("sig"))
      .filter(org.apache.spark.sql.functions.length(col("sig")) >= 8)
    s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.sig"), col("b.sig")).cast("long").as("dist"))
      .filter(col("dist") <= tau)
  }

  test("editPairs finds substitution, insertion-shift, and boundary edits") {
    val docs = Seq(
      // substitution in the middle (same length)
      (0L, "the quick brown fox jumps over the lazy dog again tonight ok"),
      (1L, "the quick brown fox jumps over the hazy dog again tonight ok"),
      // insertion at the FRONT: every later segment shifts by 3 — only the
      // shifted probe window can catch this pair
      (2L, "my the quick brown fox jumps over the lazy dog again tonight ok"),
      // edits spread across two different segments
      (3L, "thX quick brown fox jumps over the lazy dog agaiY tonight ok"),
      // far beyond tau
      (4L, "completely different words describing catalyst physical plans"),
      // below minLen after normalization: excluded
      (5L, "12345!")
    ).toDF("doc_id", "text")

    val got = FuzzyJoin.editPairs(docs, tau = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got should contain((0L, 1L, 1L)) // one substitution
    got should contain((0L, 2L, 3L)) // "my " insertion, shift-matched
    got should contain((0L, 3L, 2L)) // two spread substitutions
    got.map(p => (p._1, p._2)) should not contain ((0L, 4L))
    got.exists(p => p._1 == 5L || p._2 == 5L) shouldBe false
  }

  test("editPairs ≡ all-pairs brute force on random-ish corpus (soundness)") {
    // build a corpus where every doc is a mutation of one of 6 bases, so
    // both near and far pairs exist at every distance band
    val bases = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      "one two three four five six seven eight nine ten eleven twelve",
      "spark catalyst tungsten codegen shuffle exchange broadcast join scan",
      "red orange yellow green blue indigo violet white black brown pink",
      "north south east west up down left right forward backward around",
      "apple banana cherry date elderberry fig grape honeydew kiwi lemon")
    val docs = (0 until 60).map { i =>
      val base = bases(i % 6)
      val mut = i / 6 match {
        case 0 => base
        case 1 => base.replace('a', 'o') // many edits
        case 2 => "x" + base // 1 insert
        case 3 => base.substring(2) // 2 deletes
        case 4 => base.replaceFirst("e", "q") // 1 substitution
        case 5 => base.toUpperCase // normalizes identically
        case 6 => base.replace("t", "") // many deletes
        case 7 => base + " extra" // 6 inserts (> tau)
        case 8 => base.replaceFirst(" ", "  x ") // small insert
        case _ => base.reverse
      }
      (i.toLong, mut)
    }.toDF("doc_id", "text")

    for (tau <- Seq(2, 4)) {
      val got = FuzzyJoin.editPairs(docs, tau = tau).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = bruteForce(docs, tau).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got shouldBe want
      want should not be empty
    }
  }

  test("blocked plan joins on equi-keys, never a nested-loop product") {
    val docs = Seq((0L, "aaaa bbbb cccc dddd eeee"),
      (1L, "aaaa bbbb cccc dddd eeef")).toDF("doc_id", "text")
    val plan = FuzzyJoin.editPairs(docs).queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
