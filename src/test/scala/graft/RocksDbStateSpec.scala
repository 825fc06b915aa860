package graft

import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** State at 100 TB posture: the default HDFS-backed state store keeps
  * every key in executor heap — a dedup over 10⁹ fingerprints OOMs. The
  * RocksDB provider spills state to local disk with the same exactly-once
  * checkpoint contract. This spec proves our streams run unchanged on
  * RocksDB AND that state survives a full stop/restart from the
  * checkpoint: duplicates of pre-restart rows are still dropped by the
  * restarted query. */
class RocksDbStateSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  test("dedup state survives a restart on the RocksDB provider") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft-rocks-ckpt").toString
    try {
      val source = MemoryStream[(Long, Long, String, Double, Timestamp)]
      val df = source.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
      // foreachBatch sink: the memory sink refuses checkpoint recovery
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      def start() =
        StreamingEvents.dedupedStream(df).writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (ds: org.apache.spark.sql.DataFrame, _: Long) =>
            ds.select("event_id").as[Long].collect().foreach(emitted.add)
          }.start()

      // run 1: ids 0..99
      val q1 = start()
      try {
        source.addData((0 until 100).map(i =>
          (i.toLong, i.toLong % 7, "click", 1.0, ts(i))))
        q1.processAllAvailable()
        emitted.asScala.toList.sorted shouldBe (0L until 100L).toList
      } finally q1.stop()

      // run 2, restarted from the checkpoint: replay ids 50..99 (must be
      // dropped — their keys live only in the CHECKPOINTED RocksDB state)
      // plus fresh ids 100..119
      emitted.clear()
      val q2 = start()
      try {
        source.addData((50 until 120).map(i =>
          (i.toLong, i.toLong % 7, "click", 1.0, ts(i))))
        q2.processAllAvailable()
        emitted.asScala.toList.sorted shouldBe (100L until 120L).toList
      } finally q2.stop()

      // the state dir must actually be RocksDB-format (zip snapshots /
      // changelogs, never the HDFS provider's .delta files)
      val stateFiles = Files.walk(Paths.get(ckpt, "state")).iterator().asScala
        .filter(Files.isRegularFile(_)).map(_.toString).toList
      stateFiles should not be empty
      stateFiles.filter(_.endsWith(".delta")) shouldBe empty
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("band-excursion moment + buffer state survives a restart on the " +
    "RocksDB provider: a bucket opened before the stop emits its batch-" +
    "exact alerts when a post-restart arrival closes it") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft-rocks-band").toString
    try {
      val source = MemoryStream[(Long, String, Double, Timestamp)]
      val df = source.toDF().toDF("event_id", "event_type", "value", "ts")
      val emitted =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
      def start() =
        StreamingEvents.bandExcursionsStream(df, 3600000L, 1, 1.0)
          .toDF().writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (ds: org.apache.spark.sql.DataFrame, _: Long) =>
            ds.select("event_id", "breach").as[(Long, String)]
              .collect().foreach(emitted.add)
          }.start()

      // run 1: bucket 0 fills (incl. the outlier) and stays OPEN — its
      // moments and event buffer exist only in the checkpointed state
      val q1 = start()
      try {
        source.addData(
          (1L, "t", 10.0, ts(5)), (2L, "t", 10.2, ts(10)),
          (3L, "t", 10.1, ts(15)), (4L, "t", 99.0, ts(20)))
        q1.processAllAvailable()
        emitted.asScala.toList shouldBe empty
      } finally q1.stop()

      // run 2, restarted from the checkpoint: a bucket-1 arrival closes
      // bucket 0 — the restart must still hold the buffered outlier and
      // the accumulated moments to emit the batch-exact alert
      val q2 = start()
      try {
        source.addData((5L, "t", 10.0, ts(65)))
        q2.processAllAvailable()
        emitted.asScala.toList shouldBe List((4L, "above"))
      } finally q2.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
