package graft

import graft.ext.EventsExt
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** ScalaCheck property: the distributed counterRate ≡ a sequential
  * per-user fold over (ms, event_id)-sorted samples, under random value
  * walks that mix increments, resets (drops) and equal-timestamp
  * collisions — and the doubles are compared BIT-exactly (the operator's
  * arithmetic is a fixed IEEE op sequence; any drift is a bug, not
  * noise). */
class CounterRatePropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def model(rows: Seq[(Long, Long, Long, Double)])
      : Map[Long, (Double, Double)] =
    // rows: (event_id, user_id, ms, value) → event_id -> (increase, rate)
    rows.groupBy(_._2).values.flatMap { us =>
      us.sortBy(r => (r._3, r._1)).sliding(2).collect {
        case Seq((_, _, pm, pv), (eid, _, ms, v)) if ms > pm =>
          val inc = if (v >= pv) v - pv else v
          eid -> ((inc, inc / ((ms - pm) / 1000.0)))
      }
    }.toMap

  private val base = 1704067200000L
  private val rowsGen: Gen[List[(Long, Long, Long, Double)]] = for {
    n <- Gen.chooseNum(0, 60)
    rows <- Gen.listOfN(n, for {
      user <- Gen.chooseNum(1L, 4L)
      // coarse ms grid so equal-timestamp collisions actually happen
      ms <- Gen.chooseNum(0L, 12L).map(base + _ * 1000L)
      v <- Gen.oneOf(Gen.chooseNum(0, 1000).map(_ / 10.0),
        Gen.chooseNum(0, 7).map(_.toDouble)) // small values force drops
    } yield (user, ms, v))
  } yield rows.zipWithIndex.map { case ((u, ms, v), i) =>
    (i.toLong + 1, u, ms, v)
  }

  test("counterRate ≡ sequential pairwise fold, bit-exact (property)") {
    val prop = Prop.forAllNoShrink(rowsGen) { rows: List[(Long, Long, Long, Double)] =>
      import spark.implicits._
      val df = rows.map { case (eid, u, ms, v) =>
        (eid, u, new Timestamp(ms), v)
      }.toDF("event_id", "user_id", "ts", "value")
      val got = EventsExt.counterRate(df)
        .select("event_id", "increase", "rate_per_sec")
        .collect().map(r =>
          r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      val exp = model(rows)
      // exact double equality on purpose — same IEEE op sequence
      got == exp
    }
    PropCheck.check(prop, minSuccessful = 30, tag = "CounterRatePropSpec#1")
  }

}
