package graft

import graft.ext.Dedup
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for cross-document paragraph dedup: random corpora
  * drawn from a SMALL token alphabet (so chunk collisions actually occur)
  * must reproduce a sequential reference that walks docs in id order,
  * keeps each chunk's first occurrence, and reassembles survivors. */
class ParagraphDedupPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def referenceModel(corpus: Seq[(Long, String)],
                             p: Int): Map[Long, (Long, Long, String)] = {
    val seen = scala.collection.mutable.Set.empty[String]
    corpus.sortBy(_._1).map { case (id, text) =>
      val toks = text.split(" ", -1)
      val chunks = toks.grouped(p).map(_.mkString(" ")).toSeq
      val kept = chunks.filter { c =>
        if (seen(c)) false else { seen += c; true }
      }
      id -> ((chunks.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  test("paragraphDedup ≡ sequential first-occurrence reference") {
    import spark.implicits._
    // alphabet of 3 tokens and chunk size 2: heavy collision pressure,
    // in-doc dups, trailing partials, whole-doc wipeouts all occur
    val genDoc = Gen.chooseNum(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    val genCorpus = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, genDoc))
    val genP = Gen.chooseNum(1, 3)
    val prop = Prop.forAllNoShrink(genCorpus, genP) { (texts, p) =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.paragraphDedup(corpus.toDF("doc_id", "text"), p)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      got == referenceModel(corpus, p)
    }
    PropCheck.check(prop, minSuccessful = 40, tag = "ParagraphDedupPropSpec#1")
  }
}
