package graft

import graft.ext.EventsExt
import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The streaming time-in-state feed must reproduce the batch lead()
  * pairing EXACTLY under the in-order contract — integer epoch-ms
  * arithmetic end to end, so the (day, state) rollup over the emitted
  * intervals is bit-equal to batch stateDurations, including intervals
  * whose OPEN half crossed a micro-batch boundary and zero-length
  * equal-timestamp pairs. */
class StateDurationsStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("(day, state) rollup over 3 micro-batches ≡ batch stateDurations, " +
    "intervals crossing batch boundaries included") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String, Long)]
    val df = source.toDF().toDF("user_id", "event_id", "event_type", "ms")
      .selectExpr("user_id", "event_id", "event_type",
        "timestamp_millis(ms) AS ts")
    val query = StreamingEvents.stateDurationsStream(df).writeStream
      .format("memory").queryName("sdur").outputMode("append").start()

    val rnd = new scala.util.Random(13)
    val types = Array("on", "off", "idle")
    // in-order arrival per user across batches (the stream's contract);
    // duplicate-ms pairs included so zero-length intervals occur
    val batches = (0 until 3).map { b =>
      (0 until 50).map { i =>
        val ms = 1704067200000L + b * 3000000L + (i / 2) * 60000L
        (rnd.nextInt(4).toLong, b * 1000L + i, types(rnd.nextInt(3)), ms)
      }
    }
    try {
      batches.foreach { b => source.addData(b: _*); query.processAllAvailable() }
      val got = spark.table("sdur")
        .groupBy("day_ms", "event_type")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_intervals"),
          org.apache.spark.sql.functions.sum("dur_ms").as("dur_ms"),
          org.apache.spark.sql.functions.max("dur_ms").as("max_dur_ms"))
        .as[(Long, String, Long, Long, Long)].collect().toSet
      val batchDf = batches.flatten
        .toDF("user_id", "event_id", "event_type", "ms")
        .selectExpr("user_id", "event_id", "event_type",
          "timestamp_millis(ms) AS ts")
      val want = EventsExt.stateDurations(batchDf)
        .as[(Long, String, Long, Long, Long)].collect().toSet
      got shouldBe want
      want should not be empty
    } finally query.stop()
  }

  test("the open interval carries as state: one user, one sample per " +
    "batch — each batch emits exactly the interval the new sample closes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String, Long)]
    val df = source.toDF().toDF("user_id", "event_id", "event_type", "ms")
      .selectExpr("user_id", "event_id", "event_type",
        "timestamp_millis(ms) AS ts")
    val query = StreamingEvents.stateDurationsStream(df).writeStream
      .format("memory").queryName("sdur1").outputMode("append").start()
    val t0 = 1704067200000L
    try {
      Seq(("on", 0L), ("off", 600000L), ("on", 900000L)).zipWithIndex
        .foreach { case ((et, off), i) =>
          source.addData((7L, i.toLong, et, t0 + off))
          query.processAllAvailable()
        }
      val rows = spark.table("sdur1")
        .as[(Long, Long, String, Long)].collect().sortBy(_._4)
      // "on" held 600000ms (closed by batch 2), "off" 300000ms (batch 3);
      // the final "on" is still open — not emitted
      rows shouldBe Array((7L, t0, "off", 300000L), (7L, t0, "on", 600000L))
        .sortBy(_._4)
    } finally query.stop()
  }
}
