package graft

import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

/** T1/T2/X6 streaming twins driven through a MemoryStream micro-batch
  * source — the real Structured Streaming runtime, not a batch stand-in. */
class StreamingEventsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  test("hourlyCounts: windowed counts over micro-batches with watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, String, Double, Timestamp)]
    val df = source.toDF().toDF("event_id", "event_type", "value", "ts")
    val query = StreamingEvents.hourlyCounts(df).writeStream
      .format("memory").queryName("hc").outputMode("complete").start()
    try {
      source.addData((1L, "click", 1.0, ts(1)), (2L, "click", 2.0, ts(50)),
        (3L, "view", 1.5, ts(70)))
      query.processAllAvailable()
      val rows = spark.table("hc").collect()
      rows.length shouldBe 2
      val click = rows.find(_.getAs[String]("event_type") == "click").get
      click.getAs[Long]("n") shouldBe 2L
      click.getAs[Double]("sum_value") shouldBe 3.0
    } finally query.stop()
  }

  test("dedupedStream: duplicate event_ids are dropped across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, String, Double, Timestamp)]
    val df = source.toDF().toDF("event_id", "event_type", "value", "ts")
    val query = StreamingEvents.dedupedStream(df).writeStream
      .format("memory").queryName("dd").outputMode("append").start()
    try {
      source.addData((1L, "click", 1.0, ts(1)), (1L, "click", 1.0, ts(1)))
      query.processAllAvailable()
      source.addData((1L, "click", 1.0, ts(2)), (2L, "view", 2.0, ts(3)))
      query.processAllAvailable()
      spark.table("dd").select("event_id").as[Long].collect().sorted shouldBe
        Array(1L, 2L)
    } finally query.stop()
  }
}
