package graft

import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

/** The running-stats anomaly stream resumed from state across micro-batches
  * must equal the sequential ONLINE algorithm: events in arrival order
  * (batches in sequence, (ms, event_id)-sorted within each batch), each
  * scored against the Welford state before being folded in. */
class AnomalyStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Sequential arrival-order reference with the same Welford update. */
  private def reference(batches: Seq[Seq[(Long, Long, Double, Long)]],
                        sigmas: Double): Set[(Long, Long)] = {
    val out = Set.newBuilder[(Long, Long)]
    val st = scala.collection.mutable.Map.empty[Long, (Long, Double, Double)]
    batches.foreach { batch =>
      batch.groupBy(_._1).foreach { case (uid, rs) =>
        var (n, mean, m2) = st.getOrElse(uid, (0L, 0.0, 0.0))
        rs.sortBy(r => (r._4, r._2)).foreach { case (_, id, v, _) =>
          if (n >= 2) {
            val variance = m2 / n
            if (variance > 0 && math.abs((v - mean) / math.sqrt(variance)) >= sigmas)
              out += ((uid, id))
          }
          n += 1
          val d = v - mean
          mean += d / n
          m2 += d * (v - mean)
        }
        st(uid) = (n, mean, m2)
      }
    }
    out.result()
  }

  test("running z-scores across micro-batches ≡ the sequential online model") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Double, Long)]
    val df = source.toDF().toDF("user_id", "event_id", "value", "ms")
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
      val want = reference(batches, sigmas = 2.5)
      got shouldBe want
      want should not be empty // the fixture must actually plant spikes
    } finally query.stop()
  }

  test("late cross-batch data scores against the state at ARRIVAL, not " +
    "re-sorted history") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Double, Long)]
    val df = source.toDF().toDF("user_id", "event_id", "value", "ms")
      .selectExpr("user_id", "event_id", "value", "timestamp_millis(ms) AS ts")
    val query = StreamingEvents.anomaliesStream(df, sigmas = 1.0).writeStream
      .format("memory").queryName("anom3").outputMode("append").start()
    try {
      // batch 1: three tight values establish stats
      source.addData((1L, 10L, 50.0, 1000L), (1L, 11L, 52.0, 2000L),
        (1L, 12L, 48.0, 3000L))
      query.processAllAvailable()
      // batch 2: an EARLIER-timestamped spike arrives late — it must be
      // scored against the already-folded batch-1 stats (→ alert), exactly
      // what the arrival-order reference predicts
      source.addData((1L, 13L, 200.0, 500L))
      query.processAllAvailable()
      val got = spark.table("anom3")
        .as[(Long, Long, Double)].collect().map(a => (a._1, a._2)).toSet
      got shouldBe reference(
        Seq(Seq((1L, 10L, 50.0, 1000L), (1L, 11L, 52.0, 2000L),
          (1L, 12L, 48.0, 3000L)), Seq((1L, 13L, 200.0, 500L))), 1.0)
      got should contain((1L, 13L))
    } finally query.stop()
  }

  test("a user's first two events never alert; constant streams never alert") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Double, Long)]
    val df = source.toDF().toDF("user_id", "event_id", "value", "ms")
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
