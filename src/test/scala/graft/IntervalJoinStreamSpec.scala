package graft

import graft.ext.EventsExt
import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

/** Stream-stream interval self-join through the real streaming runtime,
  * pinned to the batch twin (bandedRangeCount) on identical data. */
class IntervalJoinStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Int) = new Timestamp(1704067200000L + sec * 1000L)

  private val data = Seq(
    (1L, 7L, "error", ts(100)),
    (2L, 7L, "click", ts(95)),    // within ±10s
    (3L, 7L, "click", ts(110)),   // exactly +10s: inclusive
    (4L, 7L, "click", ts(111)),   // outside
    (5L, 8L, "click", ts(100)),   // other user
    (6L, 9L, "error", ts(500))    // no clicks near
  )

  test("intervalJoinStream matches bandedRangeCount on the same events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String, Timestamp)]
    val df = source.toDF().toDF("event_id", "user_id", "event_type", "ts")
    val query = StreamingEvents.intervalJoinStream(df, windowMs = 10000L)
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      source.addData(data: _*)
      query.processAllAvailable()
      val streamed = spark.table("ij")
        .groupBy(col("error_id").as("event_id"), col("user_id"))
        .agg(count(lit(1)).as("n_near"))
        .as[(Long, Long, Long)].collect().toSet

      val batch = EventsExt.bandedRangeCount(
        data.toDF("event_id", "user_id", "event_type", "ts"),
        "error", "click", 10000L)
        .as[(Long, Long, Long)].collect().toSet

      streamed shouldBe batch
      streamed shouldBe Set((1L, 7L, 2L)) // clicks 2 and 3
    } finally query.stop()
  }
}
