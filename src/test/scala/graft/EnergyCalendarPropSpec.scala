package graft

import graft.ext.EventsExt
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import java.time.{Instant, ZoneId}

/** ScalaCheck property for the CALENDAR bar series through real DST
  * transitions: random SUB-HOURLY, reset-bearing, null-bearing counter
  * streams thrown across the 2024 America/New_York spring-forward and
  * fall-back windows must produce per-local-day bars identical to a
  * sequential model that attributes each reset-aware delta to the
  * java.time LOCAL DATE of its later sample — an independent formulation
  * of the zone mapping Spark runs via date_trunc + zone shifts. Exact
  * quarter-integer arithmetic on both sides, so equality is bit-for-bit.
  * (The deterministic transition pins live in EnergyCalendarSpec; this
  * fuzz adds sub-hourly sample times, equal-ms duplicates, resets, and
  * nulls around the same transitions.) */
class EnergyCalendarPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val NY = ZoneId.of("America/New_York")
  private val spring = 1709856000000L // 2024-03-08T00:00:00Z
  private val fall = 1730419200000L   // 2024-11-01T00:00:00Z
  private val Min5 = 300000L

  private val genCase: Gen[List[(Long, Long, Option[Double])]] =
    for {
      n <- Gen.chooseNum(1, 50)
      rows <- Gen.listOfN(n, for {
        user <- Gen.chooseNum(1L, 3L)
        window <- Gen.oneOf(spring, fall)
        // sub-hourly 5-minute steps across 4 days around the transition
        off <- Gen.chooseNum(0L, 4L * 24 * 12 - 1)
        v <- Gen.frequency(
          8 -> Gen.chooseNum(0, 400).map(x => Option(x / 4.0)),
          1 -> Gen.const(Option.empty[Double]))
      } yield (user, window + off * Min5, v))
    } yield rows

  /** Sequential model in exact quarter integers: per-(user, ms) max
    * dedup, reset-aware delta to the LATER sample (first sample = 0),
    * attributed to that sample's java.time local date in NY. */
  private def model(rows: Seq[(Long, Long, Option[Double])])
      : Map[(Long, Long), Long] =
    rows.collect { case (u, ms, Some(v)) => (u, ms, (v * 4).toLong) }
      .groupBy(_._1).flatMap { case (u, rs) =>
        val deduped = rs.groupBy(_._2).map { case (ms, xs) =>
          (ms, xs.map(_._3).max)
        }.toSeq.sortBy(_._1)
        val bars = scala.collection.mutable.Map.empty[Long, Long]
        var prev = Option.empty[Long]
        deduped.foreach { case (ms, q) =>
          val day = Instant.ofEpochMilli(ms).atZone(NY).toLocalDate
            .atStartOfDay(NY).toInstant.toEpochMilli
          val d = prev.fold(0L)(p => if (q >= p) q - p else q)
          bars(day) = bars.getOrElse(day, 0L) + d
          prev = Some(q)
        }
        bars.toSeq.map { case (day, tot) => (u, day) -> tot }
      }

  test("per-local-day calendar bars over random sub-hourly streams " +
    "across BOTH NY DST transitions == the java.time sequential model, " +
    "exact (property)") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAllNoShrink(genCase) { rows =>
      val df = rows.toDF("user_id", "ms", "value")
        .withColumn("ts", timestamp_millis(col("ms")))
        .select(col("user_id"), col("ts"), col("value"))
      val got = EventsExt
        .energyBarsCalendar(df, unit = "DAY", tz = "America/New_York")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          math.rint(r.getDouble(2) * 4).toLong)
        .toMap
      val want = model(rows)
      Prop.propBoolean(got == want) :| s"got=$got want=$want"
    }
    PropCheck.check(prop, minSuccessful = 15,
      tag = "EnergyCalendarPropSpec#1")
  }

  test("tiered calendar reads at a RANDOM local-midnight cutoff " +
    "(calendar-day coarse ∪ hourly fine) == untiered day AND month " +
    "bars across both DST windows, exact (property)") {
    val s = spark
    import s.implicits._
    val genWithCutoff = for {
      rows <- genCase
      window <- Gen.oneOf(spring, fall)
      dayOff <- Gen.chooseNum(0L, 5L)
    } yield (rows, window + dayOff * 86400000L)
    val prop = Prop.forAllNoShrink(genWithCutoff) { case (rows, anchor) =>
      val cutoff = Instant.ofEpochMilli(anchor).atZone(NY).toLocalDate
        .atStartOfDay(NY).toInstant.toEpochMilli
      val df = rows.toDF("user_id", "ms", "value")
        .withColumn("ts", timestamp_millis(col("ms")))
        .select(col("user_id"), col("ts"), col("value"))
      val hourly = EventsExt.counterStatsPartialsHourly(df)
      val dayTier = EventsExt.counterStatsCalendarPartials(hourly,
        unit = "DAY", tz = "America/New_York")
      val stitched = EventsExt.counterStatsCalendarTierPartials(hourly,
        dayTier, cutoffMs = cutoff, tz = "America/New_York")
      def quarters(frame: org.apache.spark.sql.DataFrame) = frame
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          math.rint(r.getDouble(2) * 4).toLong)
        .toMap
      val results = Seq("DAY", "MONTH").map { unit =>
        val tiered = quarters(EventsExt.energyBarsCalendarOfPartials(
          stitched, unit, "America/New_York"))
        val direct = quarters(EventsExt.energyBarsCalendar(
          df, unit, tz = "America/New_York"))
        (unit, tiered, direct)
      }
      val bad = results.filter { case (_, t, d) => t != d }
      Prop.propBoolean(bad.isEmpty) :|
        s"cutoff=$cutoff mismatches=$bad"
    }
    PropCheck.check(prop, minSuccessful = 10,
      tag = "EnergyCalendarPropSpec#2")
  }

  /** [[model]] generalized to any zone: reset-aware deltas to the
    * java.time LOCAL DATE of the later sample — atStartOfDay resolves a
    * gap-at-midnight (Santiago) exactly like Spark's to_utc_timestamp. */
  private def zoneModel(rows: Seq[(Long, Long, Option[Double])],
                        zone: ZoneId): Map[(Long, Long), Long] =
    rows.collect { case (u, ms, Some(v)) => (u, ms, (v * 4).toLong) }
      .groupBy(_._1).flatMap { case (u, rs) =>
        val deduped = rs.groupBy(_._2).map { case (ms, xs) =>
          (ms, xs.map(_._3).max)
        }.toSeq.sortBy(_._1)
        val bars = scala.collection.mutable.Map.empty[Long, Long]
        var prev = Option.empty[Long]
        deduped.foreach { case (ms, q) =>
          val day = Instant.ofEpochMilli(ms).atZone(zone).toLocalDate
            .atStartOfDay(zone).toInstant.toEpochMilli
          val d = prev.fold(0L)(p => if (q >= p) q - p else q)
          bars(day) = bars.getOrElse(day, 0L) + d
          prev = Some(q)
        }
        bars.toSeq.map { case (day, tot) => (u, day) -> tot }
      }

  test("per-local-day bars in the MIDNIGHT-GAP zone (Santiago, hourly " +
    "grid), the FRACTIONAL-HOUR-DST zone (Lord Howe, 30-minute grid), " +
    "the AMBIGUOUS-midnight zone (Havana, hourly grid) and the " +
    "QUARTER-hour zone (Chatham, 15-minute grid) over random " +
    "sub-hourly streams across BOTH 2024 transitions == the java.time " +
    "model, exact (property)") {
    val s = spark
    import s.implicits._
    val zones = Seq(
      // (tz, fine grid, 2024 transition windows: start 2 days before)
      ("America/Santiago", 3600000L, Seq(
        Instant.parse("2024-09-06T00:00:00Z").toEpochMilli,
        Instant.parse("2024-04-05T00:00:00Z").toEpochMilli)),
      ("Australia/Lord_Howe", 1800000L, Seq(
        Instant.parse("2024-10-03T00:00:00Z").toEpochMilli,
        Instant.parse("2024-04-05T00:00:00Z").toEpochMilli)),
      // the AMBIGUOUS-midnight zone: Havana's fall-back lands
      // 01:00 -04 → 00:00 -05 (the repeated hour REACHES midnight, so
      // the 25-hour day's key is the earlier-offset midnight), and its
      // spring-forward is AT midnight too — both anomalies fuzzed
      ("America/Havana", 3600000L, Seq(
        Instant.parse("2024-11-01T00:00:00Z").toEpochMilli,
        Instant.parse("2024-03-08T00:00:00Z").toEpochMilli)),
      // the QUARTER-hour-offset zone: Chatham's +12:45/+13:45 local
      // midnights are :15-UTC instants only the 15-minute grid contains
      ("Pacific/Chatham", 900000L, Seq(
        Instant.parse("2024-09-26T00:00:00Z").toEpochMilli,
        Instant.parse("2024-04-04T00:00:00Z").toEpochMilli)))
    zones.foreach { case (tz, everyMs, windows) =>
      val zid = ZoneId.of(tz)
      val gen: Gen[List[(Long, Long, Option[Double])]] =
        for {
          n <- Gen.chooseNum(1, 50)
          rows <- Gen.listOfN(n, for {
            user <- Gen.chooseNum(1L, 3L)
            window <- Gen.oneOf(windows)
            off <- Gen.chooseNum(0L, 4L * 24 * 12 - 1)
            v <- Gen.frequency(
              8 -> Gen.chooseNum(0, 400).map(x => Option(x / 4.0)),
              1 -> Gen.const(Option.empty[Double]))
          } yield (user, window + off * Min5, v))
        } yield rows
      val prop = Prop.forAllNoShrink(gen) { rows =>
        val df = rows.toDF("user_id", "ms", "value")
          .withColumn("ts", timestamp_millis(col("ms")))
          .select(col("user_id"), col("ts"), col("value"))
        val got = EventsExt
          .energyBarsCalendar(df, unit = "DAY", tz = tz,
            everyMs = everyMs)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            math.rint(r.getDouble(2) * 4).toLong)
          .toMap
        val want = zoneModel(rows, zid)
        Prop.propBoolean(got == want) :| s"tz=$tz got=$got want=$want"
      }
      PropCheck.check(prop, minSuccessful = 10,
        tag = s"EnergyCalendarPropSpec#3:$tz")
    }
  }
}
