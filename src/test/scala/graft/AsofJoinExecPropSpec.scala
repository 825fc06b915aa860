package graft

import graft.ext.EventsExt
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for the custom as-of merge: random key/time
  * multisets (duplicate timestamps, keys present on only one side, empty
  * sides) must agree with a driver-side reference model. The composed
  * window form ties nondeterministically on exact (key, time) duplicates
  * on the right, so the model resolves ties like the exec: latest in
  * (time, value) sort order. */
class AsofJoinExecPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merge exec ≡ reference model over random inputs") {
    import spark.implicits._
    val genLeft = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 40L)))
    val genRight = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 40L)))
    val prop = Prop.forAllNoShrink(genLeft, genRight) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "user_id", "us")
      // distinct (key, time) on the right so the match is well-defined
      val rrows = rs.distinct.map { case (k, t) => (k, t, (k * 1000 + t).toDouble) }
      val right = rrows.toDF("user_id", "us", "v")

      val got = EventsExt.asofJoinExec(left, right, "user_id", "us")
        .as[(Long, Long, Long, Option[Double])].collect().toSet

      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val m = rrows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption
        (i.toLong, k, t, m.map(_._3))
      }.toSet
      got == want
    }
    PropCheck.check(prop, minSuccessful = 25, tag = "AsofJoinExecPropSpec#1")
  }
}
