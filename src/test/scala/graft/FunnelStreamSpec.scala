package graft

import graft.ext.EventsExt
import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The streaming funnel's greedy in-time fold must equal the batch
  * min-chain exactly: per-stage survivor counts over the changelog's
  * deepest stage per user ≡ batch `funnel` on the same rows — including
  * users whose stages land in different micro-batches, out-of-sequence
  * events (a click before any view), and the strict-after contract
  * (an equal-timestamp next stage does NOT count). */
class FunnelStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val t0 = 1704067200000L

  test("per-stage survivor counts across 3 micro-batches ≡ batch funnel") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String, Long)]
    val df = source.toDF().toDF("user_id", "event_id", "event_type", "ms")
      .selectExpr("user_id", "event_id", "event_type",
        "timestamp_millis(ms) AS ts")
    val query = StreamingEvents.funnelStream(df).writeStream
      .format("memory").queryName("fnl").outputMode("append").start()

    val rnd = new scala.util.Random(17)
    val types = Array("view", "click", "purchase", "error")
    val batches = (0 until 3).map { b =>
      (0 until 60).map { i =>
        (rnd.nextInt(8).toLong, b * 1000L + i, types(rnd.nextInt(4)),
          t0 + b * 600000L + i * 1000L)
      }
    }
    try {
      batches.foreach { b => source.addData(b: _*); query.processAllAvailable() }
      val deepest = spark.table("fnl")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("stage").as("stage"))
        .as[(Long, Int)].collect().toMap
      val steps = Seq("view", "click", "purchase")
      val got = steps.indices.map { i =>
        steps.take(i + 1).mkString(">") ->
          deepest.values.count(_ >= i + 1).toLong
      }.toMap
      val batchDf = batches.flatten
        .toDF("user_id", "event_id", "event_type", "ms")
        .selectExpr("user_id", "event_id", "event_type",
          "timestamp_millis(ms) AS ts")
      val want = EventsExt.funnel(batchDf)
        .as[(String, Long)].collect().toMap
      got shouldBe want
      want("view") should be > 0L
    } finally query.stop()
  }

  test("stages advance across batch boundaries; out-of-sequence and " +
    "equal-timestamp events never count (strict after)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String, Long)]
    val df = source.toDF().toDF("user_id", "event_id", "event_type", "ms")
      .selectExpr("user_id", "event_id", "event_type",
        "timestamp_millis(ms) AS ts")
    val query = StreamingEvents.funnelStream(df).writeStream
      .format("memory").queryName("fnl1").outputMode("append").start()
    try {
      // batch 1: a click BEFORE any view (ignored), then the view
      source.addData((1L, 1L, "click", t0), (1L, 2L, "view", t0 + 1000L))
      query.processAllAvailable()
      // batch 2: a click at EXACTLY the view's ms (strict > — ignored),
      // then a real click
      source.addData((1L, 3L, "click", t0 + 1000L),
        (1L, 4L, "click", t0 + 2000L))
      query.processAllAvailable()
      // batch 3: purchase completes the funnel
      source.addData((1L, 5L, "purchase", t0 + 3000L))
      query.processAllAvailable()
      val rows = spark.table("fnl1")
        .as[(Long, Int, String, Long)].collect().sortBy(_._2)
      rows shouldBe Array(
        (1L, 1, "view", t0 + 1000L),
        (1L, 2, "view>click", t0 + 2000L),
        (1L, 3, "view>click>purchase", t0 + 3000L))
    } finally query.stop()
  }
}
