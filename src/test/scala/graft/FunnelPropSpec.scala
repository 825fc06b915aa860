package graft

import graft.ext.EventsExt
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** ScalaCheck property for the funnel's join cascade: for random event
  * sets (few users, few distinct timestamps — maximizing same-ms ties and
  * out-of-order step arrivals), the per-stage user counts must equal a
  * brute-force per-user simulation of the first-touch rule
  * (s_{i+1} = min ts of step i+1 strictly after s_i). */
class FunnelPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val steps = Seq("view", "click", "purchase")
  private val base = 1704067200000L

  test("funnel counts ≡ brute-force first-touch simulation") {
    import spark.implicits._
    val genEvent = for {
      user <- Gen.chooseNum(1L, 5L)
      tpe <- Gen.oneOf("view", "click", "purchase", "error")
      ms <- Gen.chooseNum(0L, 9L) // dense: ties and reversals are common
    } yield (user, tpe, ms)
    val prop = Prop.forAllNoShrink(Gen.listOfN(30, genEvent)) { evs =>
      val df = evs.zipWithIndex.map { case ((u, t, m), i) =>
        (i.toLong, u, t, new Timestamp(base + m))
      }.toDF("event_id", "user_id", "event_type", "ts")
      val got = EventsExt.funnel(df).as[(String, Long)].collect().toMap

      // brute force: walk the steps per user over (ms-truncated) times
      val byUser = evs.groupBy(_._1)
      var alive = byUser.keySet
      var prevT = Map.empty[Long, Long]
      val want = steps.zipWithIndex.map { case (st, i) =>
        val label = steps.take(i + 1).mkString(">")
        alive = alive.filter { u =>
          val times = byUser(u).collect {
            case (_, t, m) if t == st &&
              (i == 0 || (base + m) > prevT(u)) => base + m
          }
          if (times.isEmpty) false
          else { prevT = prevT.updated(u, times.min); true }
        }
        label -> alive.size.toLong
      }.toMap
      got == want
    }
    PropCheck.check(prop, minSuccessful = 40, tag = "FunnelPropSpec#1")
  }
}
