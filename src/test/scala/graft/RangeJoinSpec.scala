package graft

import graft.ext.{EventsExt, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RangeJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, typ: String, tMs: Long) =
    (id, user, typ, new java.sql.Timestamp(tMs))

  test("bandedRangeCount matches the naive non-equi join, edges inclusive") {
    val w = 1000L
    val events = Seq(
      ev(1, 7, "error", 10000),
      ev(2, 7, "click", 9000),   // exactly -W: inclusive
      ev(3, 7, "click", 11000),  // exactly +W: inclusive
      ev(4, 7, "click", 11001),  // just outside
      ev(5, 7, "click", 10500),  // inside, crosses a bin boundary from 1
      ev(6, 8, "click", 10000),  // other user
      ev(7, 9, "error", 500)     // error with no clicks at all
    ).toDF("event_id", "user_id", "event_type", "ts")

    val banded = EventsExt.bandedRangeCount(events, "error", "click", w)
      .as[(Long, Long, Long)].collect().toSet

    val naive = events.filter($"event_type" === "error").as("e")
      .join(events.filter($"event_type" === "click").as("c"),
        col("c.user_id") === col("e.user_id") &&
          abs(unix_millis(col("c.ts")) - unix_millis(col("e.ts"))) <= w)
      .groupBy(col("e.event_id"), col("e.user_id"))
      .agg(count(lit(1)).as("n_near"))
      .as[(Long, Long, Long)].collect().toSet

    banded shouldBe naive
    banded shouldBe Set((1L, 7L, 3L)) // clicks 2, 3, 5
  }

  test("clusterCohesion: identical vectors cohere at exactly 1.0") {
    val emb = Seq(
      (0L, Array(1f, 2f, 3f), 0),
      (1L, Array(1f, 2f, 3f), 0),
      (2L, Array(1f, 0f, 0f), 1),
      (3L, Array(0f, 1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.clusterCohesion(emb).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    out(0).getAs[Long]("n_vecs") shouldBe 2L
    out(0).getAs[Double]("avg_cosine") shouldBe 1.0 +- 1e-9
    out(0).getAs[Double]("min_cosine") shouldBe 1.0 +- 1e-9
    // orthogonal pair: each vector at 45° to the centroid
    out(1).getAs[Double]("min_cosine") shouldBe (math.sqrt(2) / 2) +- 1e-6
  }
}
