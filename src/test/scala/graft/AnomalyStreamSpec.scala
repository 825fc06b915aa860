package graft

import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

/** The running-stats anomaly stream resumed from state across micro-batches
  * must equal the sequential online algorithm over the concatenated,
  * (ms, event_id)-ordered stream — asserted against a reference loop. */
class AnomalyStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Sequential reference: score each event against all strictly earlier
    * events of its user, prefix population stats. */
  private def reference(rows: Seq[(Long, Long, Double, Long)],
                        sigmas: Double): Set[(Long, Long)] = {
    val out = Set.newBuilder[(Long, Long)]
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      var (n, sum, sumsq) = (0L, 0.0, 0.0)
      rs.sortBy(r => (r._4, r._2)).foreach { case (_, id, v, _) =>
        if (n >= 2) {
          val m = sum / n
          val variance = sumsq / n - m * m
          if (variance > 0 && math.abs((v - m) / math.sqrt(variance)) >= sigmas)
            out += ((uid, id))
        }
        n += 1; sum += v; sumsq += v * v
      }
    }
    out.result()
  }

  test("running z-scores across micro-batches ≡ the sequential online model") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Double, Long)]
    val df = source.toDF.toDF("user_id", "event_id", "value", "ms")
      .selectExpr("user_id", "event_id", "value",
        "timestamp_millis(ms) AS ts")
    val query = StreamingEvents.anomaliesStream(df, sigmas = 2.5).writeStream
      .format("memory").queryName("anom").outputMode("append").start()

    val rnd = new scala.util.Random(7)
    def batch(seed: Int): Seq[(Long, Long, Double, Long)] =
      (0 until 80).map { i =>
        val uid = rnd.nextInt(4).toLong
        val id = seed * 1000L + i
        // mostly N(50, 5)-ish noise, occasional big spike
        val v = if (rnd.nextDouble() < 0.05) 500.0 + rnd.nextInt(100)
                else 50.0 + rnd.nextGaussian() * 5
        (uid, id, v, 1704067200000L + seed * 100000L + i * 100L)
      }

    val batches = Seq(batch(1), batch(2), batch(3))
    try {
      batches.foreach { b => source.addData(b: _*); query.processAllAvailable() }
      val got = spark.table("anom")
        .as[(Long, Long, Double)].collect().map(a => (a._1, a._2)).toSet
      val want = reference(batches.flatten, sigmas = 2.5)
      got shouldBe want
      want should not be empty // the fixture must actually plant spikes
    } finally query.stop()
  }

  test("a user's first two events never alert; constant streams never alert") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Double, Long)]
    val df = source.toDF.toDF("user_id", "event_id", "value", "ms")
      .selectExpr("user_id", "event_id", "value", "timestamp_millis(ms) AS ts")
    val query = StreamingEvents.anomaliesStream(df, sigmas = 1.0).writeStream
      .format("memory").queryName("anom2").outputMode("append").start()
    try {
      // user 9: two wildly different first events; user 8: constant values
      source.addData((9L, 1L, 0.0, 0L), (9L, 2L, 1e6, 1L),
        (8L, 3L, 7.0, 0L), (8L, 4L, 7.0, 1L), (8L, 5L, 7.0, 2L))
      query.processAllAvailable()
      spark.table("anom2").count() shouldBe 0L
    } finally query.stop()
  }
}
