package graft

import graft.ext.EventsExt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EventsSlidingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events = graft.etl.Tables.events(spark, "/root/testdata/sf0.001")

  test("transitionMatrix: per-from probabilities sum to 1; counts sum to " +
    "the total number of per-user consecutive pairs") {
    val m = EventsExt.transitionMatrix(events).collect()
    m.groupBy(_.getString(0)).values.foreach { rows =>
      rows.map(_.getDouble(3)).sum shouldBe (1.0 +- 1e-9)
    }
    val totalPairs = events.groupBy("user_id").count()
      .agg(sum(col("count") - 1)).head().getLong(0)
    m.map(_.getLong(2)).sum shouldBe totalPairs
  }

  test("slidingDistinctUsers: each emitted window counts exactly the " +
    "users active in its trailing 24 hours (brute-force cross-check)") {
    val got = EventsExt.slidingDistinctUsers(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = events.select(col("user_id"),
        expr("unix_millis(date_trunc('HOUR', ts)) div 3600000").as("h"))
      .distinct().as[(Long, Long)].collect()
    val hours = pairs.map(_._2).distinct
    val want = hours.map { w =>
      (w * 3600000L) ->
        pairs.filter(p => p._2 <= w && p._2 > w - 24).map(_._1).distinct.length.toLong
    }.toMap
    got shouldBe want
  }

  test("slidingHllRegisters: estimates derived from the merged registers " +
    "(linear counting in the small-range regime) track the exact counts; " +
    "register fan-out runs over the HOURLY AGGREGATE, not raw events") {
    val exact = EventsExt.slidingDistinctUsers(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val regs = EventsExt.slidingHllRegisters(events).collect()
      .groupBy(_.getLong(0))
    regs.keySet shouldBe exact.keySet
    val m = 64
    regs.foreach { case (w, rows) =>
      // consumer-side HLL estimate with the standard small-range branch
      val z = rows.map(r => 1.0 / (1L << r.getLong(2).toInt)).sum +
        (m - rows.length).toDouble
      val raw = (0.7213 / (1.0 + 1.079 / m)) * m * m / z
      val v = m - rows.length
      val e = if (raw <= 2.5 * m && v > 0) m * math.log(m.toDouble / v) else raw
      val x = exact(w).toDouble
      math.abs(e - x) / x should be < 0.35
    }
    // plan shape: generate (the window fan-out) must consume an aggregate,
    // not the scan — i.e. an Aggregate appears below the Generate
    val plan = EventsExt.slidingHllRegisters(events)
      .queryExecution.optimizedPlan.toString
    val genIdx = plan.indexOf("Generate")
    genIdx should be >= 0
    plan.indexOf("Aggregate", genIdx) should be >= 0
  }
}
