package graft

import graft.ext.EventsExt
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for LOCF gap-fill: random per-user click sets
  * (colliding milliseconds included) must reproduce a direct reference —
  * hourly ticks from floor(first) to floor(last), each carrying the max
  * value of the latest click at-or-before it. */
class ResampleLocfPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val hour = 3600000L

  private def reference(clicks: Seq[(Long, Long, Double)])
    : Map[(Long, Long), Option[Double]] =
    clicks.groupBy(_._1).flatMap { case (uid, cs) =>
      val t0 = cs.map(_._2).min / hour * hour
      val t1 = cs.map(_._2).max / hour * hour
      (t0 to t1 by hour).map { tick =>
        val before = cs.filter(_._2 <= tick)
        val v = if (before.isEmpty) None
        else {
          val lastMs = before.map(_._2).max
          Some(before.filter(_._2 == lastMs).map(_._3).max)
        }
        (uid, tick) -> v
      }
    }

  test("resampleLocf ≡ latest-click-at-or-before-tick reference") {
    import spark.implicits._
    val genClick = for {
      uid <- Gen.chooseNum(0L, 2L)
      // a few hours of span with deliberate ms collisions
      ms <- Gen.chooseNum(0L, 5L * hour).map(_ / 1000 * 1000)
      v <- Gen.chooseNum(1, 99).map(_.toDouble)
    } yield (uid, ms, v)
    val genCorpus = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, genClick))
    val prop = Prop.forAllNoShrink(genCorpus) { clicks =>
      val events = clicks.zipWithIndex.map { case ((uid, ms, v), i) =>
        (i.toLong, uid, "click", v, new java.sql.Timestamp(ms))
      }.toDF("event_id", "user_id", "event_type", "value", "ts")
      val got = EventsExt.resampleLocf(events)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toMap
      got == reference(clicks)
    }
    PropCheck.check(prop, minSuccessful = 30, tag = "ResampleLocfPropSpec#1")
  }
}
