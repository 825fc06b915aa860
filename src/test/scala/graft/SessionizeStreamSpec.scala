package graft

import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

class SessionizeStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  test("stateful sessionization: per-user state across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val df = source.toDF().toDF("user_id", "ts")
    val query = StreamingEvents.sessionizeStream(df).writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    try {
      // batch 1: user 7 twice 10 min apart (one open session), user 9 once
      source.addData((7L, ts(0)), (7L, ts(10)), (9L, ts(5)))
      query.processAllAvailable()
      // batch 2: user 7 returns after a 41-min gap → session 1 closes
      source.addData((7L, ts(51)))
      query.processAllAvailable()
      val rows = spark.table("sess")
        .select("user_id", "session_start_ms", "session_end_ms", "n_events", "closed")
        .as[(Long, Long, Long, Long, Boolean)].collect()

      val closed = rows.filter(_._5)
      closed.map(_._1).toSeq shouldBe Seq(7L)
      closed.head._2 shouldBe 1704067200000L            // session 1 start
      closed.head._3 shouldBe 1704067200000L + 600000L  // session 1 end
      closed.head._4 shouldBe 2L                        // 2 events in session 1
      // user 7's new session and user 9's session are open updates
      rows.filter(r => !r._5).map(_._1).toSet shouldBe Set(7L, 9L)
    } finally query.stop()
  }

  test("events in one batch spanning a gap close the earlier session inline") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val df = source.toDF().toDF("user_id", "ts")
    val query = StreamingEvents.sessionizeStream(df).writeStream
      .format("memory").queryName("sess2").outputMode("append").start()
    try {
      source.addData((1L, ts(0)), (1L, ts(90)))
      query.processAllAvailable()
      val rows = spark.table("sess2")
        .select("session_start_ms", "n_events", "closed")
        .as[(Long, Long, Boolean)].collect()
      rows.filter(_._3).map(_._1).toSeq shouldBe Seq(1704067200000L)
      rows.filter(!_._3).map(_._1).toSeq shouldBe Seq(1704067200000L + 90 * 60000L)
    } finally query.stop()
  }
}
