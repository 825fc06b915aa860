package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Tolerance gates for the sketch scale paths (HLL++ distinct counts,
  * quantile sketches): estimates are engine-specific so the driver gate is
  * rows-only; these pin the estimates to the exact aggregates. */
class ApproxSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = (0 until 20000).map { i =>
    (i.toLong, (i * 2654435761L % 977).toLong, if (i % 3 == 0) "click" else "view",
      (i * 2654435761L % 100000).toDouble / 100.0)
  }.toDF("event_id", "user_id", "event_type", "value")

  test("approx_count_distinct within 5% of exact per group") {
    val exact = events.groupBy("event_type")
      .agg(countDistinct($"user_id").as("exact")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct($"user_id").as("est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.keys.foreach { k =>
      math.abs(approx(k) - exact(k)).toDouble / exact(k) should be < 0.05
    }
  }

  test("percentile_approx within 1% of exact interpolated percentile") {
    val exact = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = events.groupBy("event_type")
      .agg(expr("percentile_approx(value, 0.5, 10000)").as("p50"),
        expr("percentile_approx(value, 0.9, 10000)").as("p90")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.keys.foreach { k =>
      math.abs(approx(k)._1 - exact(k)._1) / exact(k)._1 should be < 0.01
      math.abs(approx(k)._2 - exact(k)._2) / exact(k)._2 should be < 0.01
    }
  }
}
