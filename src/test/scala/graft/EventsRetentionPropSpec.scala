package graft

import graft.ext.{EventsExt, TextAnalysis}
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz for the retention triangle and the tokenizer encode: both must
  * reproduce direct per-element references over random inputs. */
class EventsRetentionPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val day = 86400000L

  test("retention ≡ per-user first-day/offset reference over random activity") {
    import spark.implicits._
    val genEvent = for {
      uid <- Gen.chooseNum(0L, 5L)
      d <- Gen.chooseNum(0, 9) // activity day
      frac <- Gen.chooseNum(0L, day - 1) // time within the day
    } yield (uid, d.toLong * day + frac)
    val genLog = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, genEvent))
    val prop = Prop.forAllNoShrink(genLog) { log =>
      val events = log.zipWithIndex.map { case ((uid, ms), i) =>
        (i.toLong, uid, new java.sql.Timestamp(ms))
      }.toDF("event_id", "user_id", "ts")
      val got = EventsExt.retention(events)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val byUser = log.groupBy(_._1).view.mapValues(_.map(_._2 / day * day))
      val want = byUser.toSeq
        .flatMap { case (uid, days) =>
          val cohort = days.min
          days.distinct.map(d => (cohort, (d - cohort) / day, uid))
        }
        .groupBy(t => (t._1, t._2)).view
        .mapValues(_.map(_._3).distinct.size.toLong).toMap
      got == want
    }
    PropCheck.check(prop, minSuccessful = 30, tag = "EventsRetentionPropSpec#1")
  }

  test("tokenizeToIds ≡ frequency-rank reference over random small corpora") {
    import spark.implicits._
    val genDoc = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.mkString(" ")))
    val genCorpus = Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, genDoc))
    val genV = Gen.chooseNum(1, 6)
    val prop = Prop.forAllNoShrink(genCorpus, genV) { (texts, v) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = TextAnalysis.tokenizeToIds(docs.toDF("doc_id", "text"), v)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val counts = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .view.mapValues(_.size).toMap
      val vocab = counts.toSeq.sortBy { case (tok, c) => (-c, tok) }
        .take(v).zipWithIndex.map { case ((tok, _), i) => tok -> (i + 1L) }.toMap
      val want = docs.flatMap { case (id, text) =>
        text.split(" ").zipWithIndex.map { case (tok, pos) =>
          (id, pos.toLong) -> vocab.getOrElse(tok, 0L)
        }
      }.toMap
      got == want
    }
    PropCheck.check(prop, minSuccessful = 30, tag = "EventsRetentionPropSpec#2")
  }
}
