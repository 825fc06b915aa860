package graft

import graft.ext.EventsExt
import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

/** Streaming as-of join through the real runtime, pinned to the batch twin
  * on identical data — including a click arriving in a later micro-batch
  * than the purchase it must match (the reason purchases buffer until the
  * watermark passes them). */
class AsofStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val base = 1704067200000L
  private def ts(sec: Int) = new Timestamp(base + sec * 1000L)

  test("asofStream matches batch asofJoin once the watermark passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String, Timestamp, Double)]
    val df = source.toDF().toDF("event_id", "user_id", "event_type", "ts", "value")
    val query = StreamingEvents.asofStream(df)
      .writeStream.format("memory").queryName("asof_s").outputMode("append").start()
    try {
      // batch 1: a purchase arrives BEFORE the click that should match it
      source.addData(
        (1L, 7L, "purchase", ts(100), 0.0),
        (2L, 7L, "click", ts(40), 4.0))
      query.processAllAvailable()
      // batch 2: the better click (t=90 <= 100) arrives late-but-in-horizon;
      // also a purchase with no clicks and a user with clicks only
      source.addData(
        (3L, 7L, "click", ts(90), 9.0),
        (4L, 8L, "purchase", ts(120), 0.0),
        (5L, 9L, "click", ts(10), 1.0))
      query.processAllAvailable()
      // batch 3: push the watermark (2h delay) far past every purchase
      source.addData((6L, 9L, "click", ts(3 * 3600 + 200), 2.0))
      query.processAllAvailable()

      val streamed = spark.table("asof_s")
        .as[(Long, Long, Long, Option[Double])].collect().toSet

      val all = Seq(
        (1L, 7L, "purchase", ts(100), 0.0), (2L, 7L, "click", ts(40), 4.0),
        (3L, 7L, "click", ts(90), 9.0), (4L, 8L, "purchase", ts(120), 0.0),
        (5L, 9L, "click", ts(10), 1.0),
        (6L, 9L, "click", ts(3 * 3600 + 200), 2.0))
        .toDF("event_id", "user_id", "event_type", "ts", "value")
      val purchases = all.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
      val clicks = all.filter($"event_type" === "click")
        .select($"user_id", unix_micros($"ts").as("us"), $"value".as("v"))
      val batch = EventsExt.asofJoin(purchases, clicks, "user_id", "us")
        .as[(Long, Long, Long, Option[Double])].collect().toSet

      streamed shouldBe batch
      // the late-arriving t=90 click, not the batch-1 t=40 one
      streamed.find(_._1 == 1L).get._4 shouldBe Some(9.0)
      streamed.find(_._1 == 4L).get._4 shouldBe None
    } finally query.stop()
  }
}
