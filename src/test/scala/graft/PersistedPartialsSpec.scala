package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The persisted-partials compaction path: the `_persisted` queries must
  * (a) plan a parquet scan of the PARTIALS table on disk and never touch
  * the raw events file — the "persist once, compact forever, never
  * re-read raw samples" contract — and (b) produce results bit-equal to
  * the in-memory computation (BIGINT num/cov and DECIMAL(28,2)/(18,2)
  * counter slots survive the parquet round-trip exactly; the DuckDB
  * oracle gates the same equality against the direct daily fold). */
class PersistedPartialsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("events_statistics_daily_persisted: plan reads the partials " +
    "parquet only; result ≡ the in-memory compaction bit-exactly") {
    val persisted =
      SparkEntry.queries("events_statistics_daily_persisted")(spark, d)
    val plan = persisted.queryExecution.executedPlan.toString
    plan should include("graft_partials_")
    (plan should not).include("events.parquet")
    canon(persisted) shouldBe canon(
      SparkEntry.queries("events_statistics_daily")(spark, d))
  }

  test("events_counter_stats_daily_persisted: DECIMAL partials survive " +
    "the disk round-trip; plan never scans raw events") {
    val persisted =
      SparkEntry.queries("events_counter_stats_daily_persisted")(spark, d)
    val plan = persisted.queryExecution.executedPlan.toString
    plan should include("graft_partials_")
    (plan should not).include("events.parquet")
    canon(persisted) shouldBe canon(
      SparkEntry.queries("events_counter_stats_daily")(spark, d))
  }

  test("events_energy_range_persisted: the dashboard read runs off the " +
    "SAME persisted counter partials (one table on disk serves both)") {
    val persisted =
      SparkEntry.queries("events_energy_range_persisted")(spark, d)
    val plan = persisted.queryExecution.executedPlan.toString
    plan should include("graft_partials_")
    (plan should not).include("events.parquet")
    canon(persisted) shouldBe canon(
      SparkEntry.queries("events_energy_range")(spark, d))
  }
}
