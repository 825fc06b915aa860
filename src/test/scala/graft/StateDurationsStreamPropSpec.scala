package graft

import graft.ext.EventsExt
import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property: the (day, state) rollup over the streaming
  * time-in-state feed ≡ batch stateDurations for random event streams
  * under random trigger splits — in-order per-user arrival (global
  * (ms, event_id) sort before splitting), equal-timestamp zero-length
  * intervals and cross-midnight attribution included. Integer epoch-ms
  * arithmetic, so equality is exact. */
class StateDurationsStreamPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = 1704067200000L // midnight UTC

  private val genCase: Gen[(List[(Long, Long, String, Long)], Int, Int)] =
    for {
      n <- Gen.chooseNum(0, 50)
      rows <- Gen.listOfN(n, for {
        user <- Gen.chooseNum(1L, 4L)
        // spans two days on a coarse grid so midnight crossings and
        // equal-ms collisions both occur
        ms <- Gen.chooseNum(0L, 47L).map(t0 + _ * 3600000L)
        et <- Gen.oneOf("on", "off", "idle")
      } yield (user, et, ms))
      cut1 <- Gen.chooseNum(0, n)
      cut2 <- Gen.chooseNum(0, n)
    } yield (rows.zipWithIndex.map { case ((u, et, ms), i) =>
      (u, i.toLong + 1, et, ms)
    }, math.min(cut1, cut2), math.max(cut1, cut2))

  test("stateDurationsStream rollup ≡ batch stateDurations under random " +
    "streams and trigger splits (property)") {
    val prop = Prop.forAllNoShrink(genCase) { case (rows0, c1, c2) =>
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      val rows = rows0.sortBy(r => (r._4, r._2))
      val source = MemoryStream[(Long, Long, String, Long)]
      val df = source.toDF().toDF("user_id", "event_id", "event_type", "ms")
        .selectExpr("user_id", "event_id", "event_type",
          "timestamp_millis(ms) AS ts")
      val name = s"sdurp_${System.nanoTime()}"
      val q = StreamingEvents.stateDurationsStream(df).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      val got = try {
        Seq(rows.slice(0, c1), rows.slice(c1, c2), rows.slice(c2, rows.length))
          .foreach { b =>
            if (b.nonEmpty) source.addData(b: _*)
            q.processAllAvailable()
          }
        spark.table(name)
          .groupBy("day_ms", "event_type")
          .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n_intervals"),
            org.apache.spark.sql.functions.sum("dur_ms").as("dur_ms"),
            org.apache.spark.sql.functions.max("dur_ms").as("max_dur_ms"))
          .as[(Long, String, Long, Long, Long)].collect().toSet
      } finally q.stop()
      val want =
        if (rows.isEmpty) Set.empty[(Long, String, Long, Long, Long)]
        else EventsExt.stateDurations(
            rows.toDF("user_id", "event_id", "event_type", "ms")
              .selectExpr("user_id", "event_id", "event_type",
                "timestamp_millis(ms) AS ts"))
          .as[(Long, String, Long, Long, Long)].collect().toSet
      got == want
    }
    PropCheck.check(prop, minSuccessful = 15, tag = "StateDurationsStreamPropSpec#1")
  }
}
