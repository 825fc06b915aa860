package graft

import graft.ext.EventsExt
import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property: the streaming funnel's per-stage survivor counts
  * ≡ the batch min-chain for random event streams under random trigger
  * splits — in-order arrival per the stream's contract (the global
  * (ms, event_id) sort before splitting preserves per-user order),
  * equal-timestamp collisions and out-of-sequence steps included.
  * Integer equality throughout. */
class FunnelStreamPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = 1704067200000L
  private val steps = Seq("view", "click", "purchase")

  private val genCase: Gen[(List[(Long, Long, String, Long)], Int, Int)] =
    for {
      n <- Gen.chooseNum(0, 50)
      rows <- Gen.listOfN(n, for {
        user <- Gen.chooseNum(1L, 5L)
        // coarse grid so equal-ms collisions happen; includes a non-step
        // type so irrelevant events exercise the skip path
        ms <- Gen.chooseNum(0L, 14L).map(t0 + _ * 1000L)
        et <- Gen.oneOf("view", "click", "purchase", "error")
      } yield (user, et, ms))
      cut1 <- Gen.chooseNum(0, n)
      cut2 <- Gen.chooseNum(0, n)
    } yield (rows.zipWithIndex.map { case ((u, et, ms), i) =>
      (u, i.toLong + 1, et, ms)
    }, math.min(cut1, cut2), math.max(cut1, cut2))

  test("funnelStream ≡ batch funnel under random streams and trigger " +
    "splits (property)") {
    val prop = Prop.forAllNoShrink(genCase) { case (rows0, c1, c2) =>
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      // in-order arrival contract: deliver in (ms, event_id) order,
      // split at two random cuts into up to three micro-batches
      val rows = rows0.sortBy(r => (r._4, r._2))
      val source = MemoryStream[(Long, Long, String, Long)]
      val df = source.toDF().toDF("user_id", "event_id", "event_type", "ms")
        .selectExpr("user_id", "event_id", "event_type",
          "timestamp_millis(ms) AS ts")
      val name = s"fnlp_${System.nanoTime()}"
      val q = StreamingEvents.funnelStream(df).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      val got = try {
        Seq(rows.slice(0, c1), rows.slice(c1, c2), rows.slice(c2, rows.length))
          .foreach { b =>
            if (b.nonEmpty) source.addData(b: _*)
            q.processAllAvailable()
          }
        val deepest = spark.table(name)
          .groupBy(org.apache.spark.sql.functions.col("user_id"))
          .agg(org.apache.spark.sql.functions.max("stage").as("stage"))
          .as[(Long, Int)].collect().toMap
        steps.indices.map { i =>
          steps.take(i + 1).mkString(">") ->
            deepest.values.count(_ >= i + 1).toLong
        }.toMap
      } finally q.stop()
      val batchDf = rows.toDF("user_id", "event_id", "event_type", "ms")
        .selectExpr("user_id", "event_id", "event_type",
          "timestamp_millis(ms) AS ts")
      val want =
        if (rows.isEmpty) steps.indices.map(i =>
          steps.take(i + 1).mkString(">") -> 0L).toMap
        else EventsExt.funnel(batchDf).as[(String, Long)].collect().toMap
      got == want
    }
    PropCheck.check(prop, minSuccessful = 15, tag = "FunnelStreamPropSpec#1")
  }
}
