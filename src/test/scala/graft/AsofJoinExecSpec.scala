package graft

import graft.ext.EventsExt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The physical as-of operator must agree exactly with the composed
  * union+window form (itself pinned against DuckDB ASOF JOIN by the driver
  * gate) — including boundary matches, unmatched lefts, and both sides
  * derived from the same scan (ExprId dedup). */
class AsofJoinExecSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merge exec equals composed asofJoin on edge cases") {
    val left = Seq(
      (1L, 10L, 100L), // exact-tie with a right row at 100
      (2L, 10L, 99L),  // before any right row -> null
      (3L, 10L, 250L), // picks latest of several
      (4L, 20L, 500L), // key with no right rows at all -> null
      (5L, 30L, 100L)  // key only on the left
    ).toDF("event_id", "user_id", "us")
    val right = Seq(
      (10L, 100L, 1.0),
      (10L, 200L, 2.0),
      (10L, 240L, 3.0),
      (30L, 101L, 9.0) // just after the only left row of key 30
    ).toDF("user_id", "us", "v")

    val got = EventsExt.asofJoinExec(left, right, "user_id", "us")
      .select($"event_id", $"v").as[(Long, Option[Double])].collect().toMap
    got shouldBe Map(1L -> Some(1.0), 2L -> None, 3L -> Some(3.0),
      4L -> None, 5L -> None)

    val composed = EventsExt.asofJoin(left, right, "user_id", "us")
      .select($"event_id", $"v").as[(Long, Option[Double])].collect().toMap
    got shouldBe composed
  }

  test("right value columns colliding with left names are rejected up front") {
    val left = Seq((1L, 10L, 100L, 7.0)).toDF("event_id", "user_id", "us", "v")
    val right = Seq((10L, 90L, 1.0)).toDF("user_id", "us", "v")
    val e = intercept[IllegalArgumentException] {
      EventsExt.asofJoinExec(left, right, "user_id", "us")
    }
    e.getMessage should include("collide")
  }

  test("exec agrees with composed form on the events fixture shape") {
    val ev = (0L until 2000L).map { i =>
      (i, i % 37, if (i % 3 == 0) "purchase" else "click", (i * 13) % 10007)
    }.toDF("event_id", "user_id", "event_type", "us")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"us")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"us", ($"event_id" * 2).cast("double").as("lcv"))

    val a = EventsExt.asofJoinExec(purchases, clicks, "user_id", "us")
      .as[(Long, Long, Long, Option[Double])].collect().toSet
    val b = EventsExt.asofJoin(purchases, clicks, "user_id", "us")
      .as[(Long, Long, Long, Option[Double])].collect().toSet
    a shouldBe b
    a.size shouldBe purchases.count()
  }

  test("plan contains the custom exec and co-partitioned sorts") {
    val l = Seq((1L, 1L, 1L)).toDF("event_id", "user_id", "us")
    val r = Seq((1L, 1L, 1.0)).toDF("user_id", "us", "v")
    val df = EventsExt.asofJoinExec(l, r, "user_id", "us")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("AsofJoin")
    plan should include("Sort")
  }
}
