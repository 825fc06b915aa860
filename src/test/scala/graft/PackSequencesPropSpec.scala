package graft

import graft.ext.Curation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{coalesce, lit, split, sum}
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for the two-pass distributed prefix scan: random
  * corpora (skewed languages, random token counts, random sequence length)
  * must produce exactly the per-lang window cumsum assignment — including
  * runs where a language straddles several range partitions. */
class PackSequencesPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("packSequences ≡ window cumsum over random corpora") {
    import spark.implicits._
    val genDoc = for {
      lang <- Gen.frequency(8 -> Gen.const("en"), 2 -> Gen.const("de"),
        1 -> Gen.const("fr"))
      n <- Gen.chooseNum(1, 40)
    } yield (lang, n)
    val genCorpus = Gen.listOfN(40, genDoc)
    val genSeqLen = Gen.chooseNum(8L, 256L)
    val prop = Prop.forAllNoShrink(genCorpus, genSeqLen) { (corpus, seqLen) =>
      val docs = corpus.zipWithIndex.map { case ((lang, n), i) =>
        (i.toLong, (1 to n).map(j => s"w$j").mkString(" "), lang, "s")
      }.toDF("doc_id", "text", "lang", "source")
      val got = Curation.packSequences(docs, seqLen)
        .as[(Long, String, Long, Long, Long)].collect().toSet
      val w = Window.partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = docs.select($"doc_id", $"lang",
          org.apache.spark.sql.functions.size(split($"text", " "))
            .cast("long").as("n_tokens"))
        .withColumn("before", coalesce(sum($"n_tokens").over(w), lit(0L)))
        .select($"doc_id", $"lang", $"n_tokens",
          ($"before" / seqLen).cast("long").as("seq_id"),
          ($"before" % seqLen).as("seq_offset"))
        .as[(Long, String, Long, Long, Long)].collect().toSet
      got == want
    }
    PropCheck.check(prop, minSuccessful = 15, tag = "PackSequencesPropSpec#1")
  }
}
