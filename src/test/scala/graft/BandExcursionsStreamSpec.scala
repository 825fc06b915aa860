package graft

import graft.ext.EventsExt
import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming band-excursion alerts ≡ batch
  * [[graft.ext.EventsExt.bandExcursions]] on CLOSED buckets: a (type,
  * bucket)'s band is final once a later-bucket event of the same type
  * arrives (the trailing frame only looks backward), at which point the
  * stream emits exactly the batch operator's alert rows for that bucket —
  * bit-equal doubles, because both sides sum the same milli-quantized
  * integer moments and finish with the same IEEE op sequence. The
  * still-open last bucket per type is not yet emitted, exactly the batch
  * restriction. */
class BandExcursionsStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val t0 = 1704067200000L // 2024-01-01T00:00:00Z
  private val hour = 3600000L

  private def toEvents(rows: Seq[(Long, String, Double, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "event_type", "value", "ms")
      .selectExpr("event_id", "event_type", "value",
        "timestamp_millis(ms) AS ts")
  }

  private def closedBatch(rows: Seq[(Long, String, Double, Long)],
                          lookback: Int, k: Double)
      : Set[(Long, String, Long, Double, String)] = {
    import spark.implicits._
    if (rows.isEmpty) return Set.empty
    val maxBucket = rows.groupBy(_._2).view.mapValues(
      _.map(r => r._4 - Math.floorMod(r._4, hour)).max).toMap
    EventsExt.bandExcursions(toEvents(rows), hour, lookback, k)
      .as[(Long, String, Long, Double, String)].collect()
      .filter(r => r._3 < maxBucket(r._2)).toSet
  }

  test("planted outlier emits 'above' the moment its bucket closes; " +
    "singleton windows never alert; the open bucket stays unemitted") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      (1L, "t", 10.0, t0 + 5 * 60000L),
      (2L, "t", 10.2, t0 + 10 * 60000L),
      (3L, "t", 10.1, t0 + 15 * 60000L),
      (4L, "t", 99.0, t0 + 20 * 60000L), // the outlier
      (5L, "t", 10.0, t0 + hour + 5 * 60000L), // closes bucket 0
      (6L, "t", 777.0, t0 + 2 * hour + 5 * 60000L)) // closes bucket 1 (n=1)
    val source = MemoryStream[(Long, String, Double, Long)]
    val df = source.toDF().toDF("event_id", "event_type", "value", "ms")
      .selectExpr("event_id", "event_type", "value",
        "timestamp_millis(ms) AS ts")
    val name = s"bandx_hand_${System.nanoTime()}"
    val q = StreamingEvents.bandExcursionsStream(df, hour, 1, 1.0)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      source.addData(rows.take(4): _*); q.processAllAvailable()
      // bucket 0 still open: nothing emitted yet
      spark.table(name).count() shouldBe 0L
      source.addData(rows(4)); q.processAllAvailable()
      val afterClose = spark.table(name)
        .as[(Long, String, Long, Double, String)].collect().toSet
      afterClose.map(_._1) shouldBe Set(4L)
      afterClose.head._5 shouldBe "above"
      source.addData(rows(5)); q.processAllAvailable()
      val fin = spark.table(name)
        .as[(Long, String, Long, Double, String)].collect().toSet
      // bucket 1 closed with n=1 → NULL band, no alert; bucket 2 open
      fin shouldBe closedBatch(rows, 1, 1.0)
      fin.map(_._1) shouldBe Set(4L)
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
    }
  }

  test("streamed alerts ≡ batch bandExcursions on closed buckets for " +
    "random streams and trigger splits (property)") {
    val genCase = for {
      n <- Gen.chooseNum(0, 60)
      rows <- Gen.listOfN(n, for {
        tpe <- Gen.oneOf("a", "b")
        slot <- Gen.chooseNum(0L, 71L) // 6 hours on a 5-min grid
        v <- Gen.frequency(
          8 -> Gen.chooseNum(0, 40).map(_ / 4.0),
          1 -> Gen.const(500.0),
          1 -> Gen.const(-500.0))
      } yield (tpe, v, t0 + slot * 300000L))
      cut1 <- Gen.chooseNum(0, n)
      cut2 <- Gen.chooseNum(0, n)
    } yield (rows.zipWithIndex.map { case ((tpe, v, ms), i) =>
      (i.toLong + 1, tpe, v, ms)
    }, math.min(cut1, cut2), math.max(cut1, cut2))
    val prop = Prop.forAllNoShrink(genCase) { case (rows0, c1, c2) =>
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      val rows = rows0.sortBy(r => (r._4, r._1))
      val source = MemoryStream[(Long, String, Double, Long)]
      val df = source.toDF().toDF("event_id", "event_type", "value", "ms")
        .selectExpr("event_id", "event_type", "value",
          "timestamp_millis(ms) AS ts")
      val name = s"bandxp_${System.nanoTime()}"
      val q = StreamingEvents.bandExcursionsStream(df, hour, 3, 0.5)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val got = try {
        Seq(rows.slice(0, c1), rows.slice(c1, c2),
          rows.slice(c2, rows.length)).foreach { b =>
          if (b.nonEmpty) source.addData(b: _*)
          q.processAllAvailable()
        }
        spark.table(name)
          .as[(Long, String, Long, Double, String)].collect().toSet
      } finally q.stop()
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
      got == closedBatch(rows, 3, 0.5)
    }
    PropCheck.check(prop, minSuccessful = 15, tag = "BandExcursionsStreamSpec#1")
  }
}
