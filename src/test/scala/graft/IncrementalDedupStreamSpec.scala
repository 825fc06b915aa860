package graft

import graft.ext.Dedup
import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

/** Continuous-ingest dedup must keep exactly the docs the batch
  * incremental dedup keeps: not in the base corpus, first occurrence
  * within the stream. Arrival order = doc_id order, so the batch's
  * min(doc_id) winner IS the stream's first arrival. */
class IncrementalDedupStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  test("streamed kept set ≡ batch incrementalDedup, across micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // base corpus: texts b0..b9
    val base = (0 until 10).map(i => (100L + i, s"base text $i"))
      .toDF("doc_id", "text")
    // stream: 30 docs — 10 fresh, 10 duplicating the base, 10 duplicating
    // an EARLIER stream doc (5 of those across a micro-batch boundary)
    val rows = (
      (0 until 10).map(i => (i.toLong, ts(i), s"fresh text $i")) ++
      (10 until 20).map(i => (i.toLong, ts(i), s"base text ${i - 10}")) ++
      (20 until 30).map(i => (i.toLong, ts(i), s"fresh text ${i - 20}"))
    ).sortBy(_._1)

    val source = MemoryStream[(Long, Timestamp, String)]
    val df = source.toDF().toDF("doc_id", "ts", "text")
    val query = StreamingEvents.incrementalDedupStream(df, base).writeStream
      .format("memory").queryName("inc_dedup").outputMode("append").start()
    try {
      source.addData(rows.take(15)); query.processAllAvailable()
      source.addData(rows.drop(15)); query.processAllAvailable()

      val streamedKept = spark.table("inc_dedup")
        .select(col("doc_id")).as[Long].collect().toSet
      val batchKept = Dedup.incrementalDedup(
          base.withColumn("lang", lit("en")).withColumn("source", lit("s")),
          rows.toDF("doc_id", "ts", "text"))
        .filter(col("kept"))
        .select(col("doc_id")).as[Long].collect().toSet

      streamedKept shouldBe batchKept
      streamedKept shouldBe (0L until 10L).toSet // only the fresh 10
    } finally query.stop()
  }
}
