package graft

import graft.ext.EventsExt
import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The EWMA stream resumed from two-number state across micro-batches must
  * end (last emission per user) EXACTLY equal to the batch integer fold
  * over the same rows — the recursion is integer arithmetic end to end,
  * so this is bit-equality, not tolerance. */
class EwmaStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("final per-user level across 3 micro-batches ≡ batch ewmaLevel") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Double, Long)]
    val df = source.toDF().toDF("user_id", "event_id", "value", "ms")
      .selectExpr("user_id", "event_id", "value", "timestamp_millis(ms) AS ts")
    val query = StreamingEvents.ewmaStream(df).writeStream
      .format("memory").queryName("ewma").outputMode("append").start()

    val rnd = new scala.util.Random(11)
    // in-order arrival (the stream's contract): ms increases across batches
    val batches = (0 until 3).map { b =>
      (0 until 60).map { i =>
        (rnd.nextInt(5).toLong, b * 1000L + i,
          rnd.nextDouble() * 100, 1704067200000L + b * 100000L + i * 100L)
      }
    }
    try {
      batches.foreach { b => source.addData(b: _*); query.processAllAvailable() }
      val got = spark.table("ewma").as[(Long, Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(rs => { val r = rs.maxBy(_._2); (r._2, r._3) }).toMap
      val batchDf = batches.flatten
        .toDF("user_id", "event_id", "value", "ms")
        .selectExpr("user_id", "event_id", "value",
          "timestamp_millis(ms) AS ts")
      val want = EventsExt.ewmaLevel(batchDf).as[(Long, Long, Long)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      got shouldBe want
      want.size shouldBe 5
    } finally query.stop()
  }

  test("state carries across batches: a single-user stream matches the " +
    "hand fold even when the history spans every batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Double, Long)]
    val df = source.toDF().toDF("user_id", "event_id", "value", "ms")
      .selectExpr("user_id", "event_id", "value", "timestamp_millis(ms) AS ts")
    val query = StreamingEvents.ewmaStream(df).writeStream
      .format("memory").queryName("ewma1").outputMode("append").start()
    try {
      // values 1.0 | 2.0 | 3.0 in three separate batches
      Seq(1.0, 2.0, 3.0).zipWithIndex.foreach { case (v, i) =>
        source.addData((7L, i.toLong, v, 1704067200000L + i * 1000L))
        query.processAllAvailable()
      }
      val rows = spark.table("ewma1").as[(Long, Long, Long)].collect().sortBy(_._2)
      // changelog: after each batch the level is 1000, 1500, 2250
      rows shouldBe Array((7L, 1L, 1000L), (7L, 2L, 1500L), (7L, 3L, 2250L))
    } finally query.stop()
  }
}
