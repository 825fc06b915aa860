package graft

import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

/** Streaming HLL registers: flushed windows must be BIT-IDENTICAL to the
  * batch register build (max is merge-order-invariant), with per-window
  * state bounded by 2^p regardless of event volume. */
class HllStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  test("flushed hourly registers equal the batch computation bit-for-bit") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val df = source.toDF().toDF("user_id", "ts")
    val query = StreamingEvents.hllDistinctUsersStream(df).writeStream
      .format("memory").queryName("hll").outputMode("append").start()
    val rows = (0 until 300).map(i => ((i % 37).toLong, ts(i / 5)))
    try {
      // three micro-batches; a final far-future row pushes the watermark
      // past every data window so append mode flushes them all
      source.addData(rows.slice(0, 100)); query.processAllAvailable()
      source.addData(rows.slice(100, 200)); query.processAllAvailable()
      source.addData(rows.slice(200, 300) :+ (999L, ts(10000)))
      query.processAllAvailable()

      val streamed = spark.table("hll")
        .select(unix_millis(col("window.start")).as("hour_ms"),
          col("bucket"), col("r"))
        .as[(Long, Long, Long)].collect().toSet
      val (bucket, rho) = graft.ext.Sketches.hllBucketRho(
        graft.ext.PortableDedup.md5Hash32(col("user_id").cast("string")))
      val batch = rows.toDF("user_id", "ts")
        .groupBy(window(col("ts"), "1 hour"), bucket.as("bucket"))
        .agg(max(rho).as("r"))
        .select(unix_millis(col("window.start")).as("hour_ms"),
          col("bucket"), col("r"))
        .as[(Long, Long, Long)].collect().toSet
      streamed should contain allElementsOf batch // every data window flushed
      // per-window state bound: at most 2^6 registers per window
      streamed.groupBy(_._1).values.foreach(_.size should be <= 64)
    } finally query.stop()
  }
}
