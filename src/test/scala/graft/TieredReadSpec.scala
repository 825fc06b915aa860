package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The TIER-STITCHED retention reads: a panel spanning the boundary
  * between fine partials (recent) and a coarse compacted tier (old) must
  * (a) plan TWO partials-parquet scans and never touch raw events — the
  * read a retention ladder serves once fine partials age out — and
  * (b) behave as if compaction never happened: daily rows before the
  * seam, hourly after, cumulative counter state running straight across
  * it. The DuckDB oracle gates the same queries against a direct
  * mixed-granularity computation from raw events. */
class TieredReadSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private val CutoffMs = 1705276800000L // 2024-01-15T00:00:00Z
  private val DayMs = 86400000L

  private def planOf(name: String): (org.apache.spark.sql.DataFrame, String) = {
    val df = SparkEntry.queries(name)(spark, d)
    (df, df.queryExecution.executedPlan.toString)
  }

  test("events_statistics_range_tiered: two partials scans, no raw " +
    "events; daily keys before the seam, hourly after") {
    val (df, plan) = planOf("events_statistics_range_tiered")
    plan should include("graft_partials_")
    (plan should not).include("events.parquet")
    "FileScan parquet".r.findAllIn(plan).size shouldBe 2
    val keys = df.select(col("bucket_ms")).collect().map(_.getLong(0))
    keys should not be empty
    keys.filter(_ < CutoffMs).foreach(_ % DayMs shouldBe 0L)
    // the fine tier is genuinely hourly: some post-seam key is intra-day
    keys.filter(_ >= CutoffMs).exists(_ % DayMs != 0L) shouldBe true
  }

  test("events_counter_stats_tiered: the cumulative sum_total crosses " +
    "the seam — final per-user totals equal the untiered hourly panel's") {
    val s = spark
    import s.implicits._
    val (df, plan) = planOf("events_counter_stats_tiered")
    plan should include("graft_partials_")
    (plan should not).include("events.parquet")
    "FileScan parquet".r.findAllIn(plan).size shouldBe 2
    def lastTotals(frame: org.apache.spark.sql.DataFrame) = frame
      .groupBy(col("user_id"))
      .agg(max_by(col("sum_total"), col("bucket_start_ms")).as("t"))
      .as[(Long, Double)].collect().toMap
    lastTotals(df) shouldBe
      lastTotals(SparkEntry.queries("events_counter_stats_hourly")(spark, d))
  }

  test("events_energy_range_tiered: the dashboard range read across the " +
    "seam returns the untiered energy (compaction is invisible)") {
    val s = spark
    import s.implicits._
    val (df, plan) = planOf("events_energy_range_tiered")
    plan should include("graft_partials_")
    (plan should not).include("events.parquet")
    def energies(frame: org.apache.spark.sql.DataFrame) = frame
      .select(col("user_id"), col("energy"))
      .as[(Long, Double)].collect().toMap
    energies(df) shouldBe
      energies(SparkEntry.queries("events_energy_range")(spark, d))
  }

  test("events_energy_bars_monthly_tiered: two partials scans (hourly " +
    "recency + calendar-day history), no raw events; keys are true NY " +
    "month starts and the bars equal the untiered monthly view") {
    val s = spark
    import s.implicits._
    val (df, plan) = planOf("events_energy_bars_monthly_tiered")
    plan should include("graft_partials_")
    (plan should not).include("events.parquet")
    "FileScan parquet".r.findAllIn(plan).size shouldBe 2
    def bars(frame: org.apache.spark.sql.DataFrame) = frame
      .select(col("user_id"), col("bucket_start_ms"), col("energy"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val tiered = bars(df)
    tiered should not be empty
    val ny = java.time.ZoneId.of("America/New_York")
    tiered.keys.map(_._2).foreach { k =>
      val local = java.time.Instant.ofEpochMilli(k).atZone(ny)
      local.toLocalTime shouldBe java.time.LocalTime.MIDNIGHT
      local.getDayOfMonth shouldBe 1
    }
    tiered shouldBe
      bars(SparkEntry.queries("events_energy_bars_monthly")(spark, d))
  }

  test("events_statistics_monthly_tiered: the mean-family sibling — two " +
    "partials scans, no raw events, bit-equal to the untiered monthly " +
    "statistics view") {
    val (df, plan) = planOf("events_statistics_monthly_tiered")
    plan should include("graft_partials_")
    (plan should not).include("events.parquet")
    "FileScan parquet".r.findAllIn(plan).size shouldBe 2
    def rows(frame: org.apache.spark.sql.DataFrame) = frame
      .collect().map(_.toSeq).toSet
    val tiered = rows(df)
    tiered should not be empty
    tiered shouldBe
      rows(SparkEntry.queries("events_statistics_monthly_local")(spark, d))
  }

  test("events_energy_bars_monthly_kolkata_tiered: the half-hour zone " +
    "THROUGH the tier stitch — two partials scans, no raw events, keys " +
    "are true IST month starts (:30 UTC instants), bars equal the " +
    "untiered Kolkata view") {
    val s = spark
    import s.implicits._
    val (df, plan) = planOf("events_energy_bars_monthly_kolkata_tiered")
    plan should include("graft_partials_")
    (plan should not).include("events.parquet")
    "FileScan parquet".r.findAllIn(plan).size shouldBe 2
    def bars(frame: org.apache.spark.sql.DataFrame) = frame
      .select(col("user_id"), col("bucket_start_ms"), col("energy"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val tiered = bars(df)
    tiered should not be empty
    val ist = java.time.ZoneId.of("Asia/Kolkata")
    tiered.keys.map(_._2).foreach { k =>
      val local = java.time.Instant.ofEpochMilli(k).atZone(ist)
      local.toLocalTime shouldBe java.time.LocalTime.MIDNIGHT
      local.getDayOfMonth shouldBe 1
      // the month boundary really is a half-hour UTC instant — the
      // boundary no hourly grid contains
      k % 3600000L shouldBe 1800000L
    }
    tiered shouldBe
      bars(SparkEntry.queries("events_energy_bars_monthly_kolkata")(spark, d))
  }

  test("events_statistics_monthly_kolkata_tiered: the mean-family " +
    "composed gate — two partials scans, no raw events, bit-equal to " +
    "the untiered Kolkata monthly statistics") {
    val (df, plan) = planOf("events_statistics_monthly_kolkata_tiered")
    plan should include("graft_partials_")
    (plan should not).include("events.parquet")
    "FileScan parquet".r.findAllIn(plan).size shouldBe 2
    def rows(frame: org.apache.spark.sql.DataFrame) = frame
      .collect().map(_.toSeq).toSet
    val tiered = rows(df)
    tiered should not be empty
    tiered shouldBe
      rows(SparkEntry.queries("events_statistics_monthly_kolkata")(spark, d))
  }
}
