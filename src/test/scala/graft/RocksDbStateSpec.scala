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
  private lazy val spark = TestSpark.isolated() // mutates session confs — see TestSpark.isolated

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

  test("counter-statistics stream state (carried sample + open buckets + " +
    "cumBase) survives TWO restarts on the RocksDB provider: the stitch " +
    "pairs across the stop, and the running total keeps evicted buckets") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft-rocks-cstat").toString
    val t0 = 1704067200000L
    val hour = 3600000L
    try {
      val opts = graft.sources.InfluxRollupRead.counterStatisticsOptions(
        hour, Map("rollup.startMs" -> t0.toString))
      val spec = graft.sources.InfluxRollupRead.fromOptions(
        scala.jdk.CollectionConverters.MapHasAsJava(opts).asJava).get
      val source = MemoryStream[(Long, Option[Double], Option[Long],
        Option[Double], Option[Long], Option[Double])]
      val df = source.toDF().toDF("bucket_start_ms", "increase",
        "first_num_time", "first_num_value", "last_num_time",
        "last_num_value")
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Double, Double, Double)]()
      def start() =
        StreamingEvents.influxCounterStatStream(df, spec)
          .toDF().writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (ds: org.apache.spark.sql.DataFrame, _: Long) =>
            ds.select("bucket_start_ms", "state", "increase", "sum_total")
              .as[(Long, Double, Double, Double)]
              .collect().foreach(emitted.add)
          }.start()

      // run 1: one segment in bucket t0 (inc 5, boundaries 10 → 15)
      val q1 = start()
      try {
        source.addData((t0, Some(5.0), Some(t0 + 60000L), Some(10.0),
          Some(t0 + 120000L), Some(15.0)))
        q1.processAllAvailable()
        emitted.asScala.toList shouldBe List((t0, 15.0, 5.0, 5.0))
      } finally q1.stop()

      // run 2, restarted: a segment two buckets later must stitch with
      // the CHECKPOINTED carried sample (20 − 15 = 5 → inc 6) and its
      // running total must still see bucket t0's 5 (open-bucket map)
      emitted.clear()
      val q2 = start()
      try {
        source.addData((t0 + 2 * hour, Some(1.0), Some(t0 + 2 * hour + 60000L),
          Some(20.0), Some(t0 + 2 * hour + 120000L), Some(21.0)))
        q2.processAllAvailable()
        emitted.asScala.toList shouldBe
          List((t0 + 2 * hour, 21.0, 6.0, 11.0))
      } finally q2.stop()

      // run 3, restarted again: bucket t0 has since been EVICTED into
      // cumBase — a third segment's total (5 + 6 + 2 = 13) is correct
      // only if that one checkpointed double survived the restart
      emitted.clear()
      val q3 = start()
      try {
        source.addData((t0 + 3 * hour, Some(1.0), Some(t0 + 3 * hour + 60000L),
          Some(22.0), Some(t0 + 3 * hour + 120000L), Some(23.0)))
        q3.processAllAvailable()
        emitted.asScala.toList shouldBe
          List((t0 + 3 * hour, 23.0, 2.0, 13.0))
      } finally q3.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("raw-events counter fold state (carried sample + PREDECESSOR + " +
    "cumBase) survives a restart on RocksDB: a post-restart equal-" +
    "timestamp winner still replaces the pre-restart delta exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft-rocks-cstats").toString
    val t0 = 1704067200000L
    try {
      val source = MemoryStream[(Long, Long, Long, Double)]
      val df = source.toDF().toDF("event_id", "user_id", "ms", "value")
        .selectExpr("event_id", "user_id", "value",
          "timestamp_millis(ms) AS ts")
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Double, Double, Double)]()
      def start() =
        StreamingEvents.counterStatsStream(df).toDF().writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (ds: org.apache.spark.sql.DataFrame, _: Long) =>
            ds.select("bucket_start_ms", "state", "increase", "sum_total")
              .as[(Long, Double, Double, Double)]
              .collect().foreach(emitted.add)
          }.start()

      // run 1: 10 @00:05 (first sample, delta 0) then 4 @00:10 — a reset,
      // so the folded delta is 4
      val q1 = start()
      try {
        source.addData((1L, 7L, t0 + 300000L, 10.0),
          (2L, 7L, t0 + 600000L, 4.0))
        q1.processAllAvailable()
        emitted.asScala.toList shouldBe List((t0, 4.0, 4.0, 4.0))
      } finally q1.stop()

      // run 2, restarted: an equal-timestamp WINNER (9 @00:10) — correct
      // only if the restart still holds the predecessor (10): the reset
      // delta 4 is replaced by reset delta 9, not added to
      emitted.clear()
      val q2 = start()
      try {
        source.addData((3L, 7L, t0 + 600000L, 9.0))
        q2.processAllAvailable()
        emitted.asScala.toList shouldBe List((t0, 9.0, 9.0, 9.0))
      } finally q2.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("statistics-partials state (carried LOCF sample + open buckets) " +
    "survives a restart on RocksDB: a post-restart closing sample splits " +
    "the pre-restart hold across buckets bit-exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft-rocks-statp").toString
    val t0 = 1704067200000L
    val hour = 3600000L
    try {
      val source = MemoryStream[(Long, String, Long, Double)]
      val df = source.toDF().toDF("event_id", "event_type", "ms", "value")
        .selectExpr("event_id", "event_type", "value",
          "timestamp_millis(ms) AS ts")
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Long, Option[Double], Option[Double], Long)]()
      def start() =
        StreamingEvents.statisticsPartialsStream(df).toDF().writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (ds: org.apache.spark.sql.DataFrame, _: Long) =>
            ds.selectExpr("bucket_ms", "num", "cov", "mn", "mx", "n_seen")
              .as[(Long, Long, Long, Option[Double], Option[Double], Long)]
              .collect().foreach(emitted.add)
          }.start()

      // run 1: one sample 10.0 @00:30 — the hold stays OPEN (nothing
      // closes it), only the raw-arrival min/max fold emits
      val q1 = start()
      try {
        source.addData((1L, "a", t0 + 30 * 60000L, 10.0))
        q1.processAllAvailable()
        emitted.asScala.toList shouldBe
          List((t0, 0L, 0L, Some(10.0), Some(10.0), 1L))
      } finally q1.stop()

      // run 2, restarted: 20.0 @02:15 closes the pre-restart hold
      // [00:30, 02:15) — split across h0/h1/h2 with the carried sample's
      // value·ms, correct ONLY if the restart kept (lastMs, lastVm)
      emitted.clear()
      val q2 = start()
      try {
        source.addData((2L, "a", t0 + 135 * 60000L, 20.0))
        q2.processAllAvailable()
        val byBucket = emitted.asScala.toList
          .groupBy(_._1).map { case (b, rs) =>
            val w = rs.maxBy(_._6); b -> ((w._2, w._3, w._4, w._5))
          }
        byBucket shouldBe Map(
          t0 -> ((10000L * 1800000L, 1800000L, Some(10.0), Some(10.0))),
          (t0 + hour) -> ((10000L * 3600000L, 3600000L, None, None)),
          (t0 + 2 * hour) -> ((10000L * 900000L, 900000L,
            Some(20.0), Some(20.0))))
      } finally q2.stop()
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
