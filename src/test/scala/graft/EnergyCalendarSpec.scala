package graft

import graft.ext.EventsExt
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.time.{Instant, LocalDate, ZoneId}

/** CALENDAR-grid energy bars through real DST transitions — the case no
  * fixed `gridMs` (and no fixed offset) can express: per-LOCAL-day bars in
  * America/New_York across the 2024 spring-forward (Mar 10, a 23-hour
  * day) and fall-back (Nov 3, a 25-hour day). The expected bars come from
  * an independent sequential model — per-sample reset-aware deltas
  * attributed to the LOCAL DATE of the later sample via java.time — while
  * the product re-buckets hourly DECIMAL partials through
  * `date_trunc(unit, tz)`; values are quarter-units so both sides are
  * exact and the comparison is bit-for-bit. */
class EnergyCalendarSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val NY = ZoneId.of("America/New_York")
  private val Hour = 3600000L

  /** Hourly counter readings: quarter-unit increments with one RESET
    * (value drops to 0.25) mid-span, deterministic from the index. */
  private def readings(uid: Long, startIso: String,
                       hours: Int): Seq[(Long, Long, Double)] = {
    val t0 = Instant.parse(startIso).toEpochMilli
    (0 until hours).map { h =>
      val v =
        if (h < 60) 10.0 + 0.25 * h
        else 0.25 + 0.25 * (h - 60) // counter reset at h == 60
      (uid, t0 + h * Hour, v)
    }
  }

  // user 1 spans the SPRING-FORWARD transition (2024-03-10 02:00 local),
  // user 2 the FALL-BACK one (2024-11-03 02:00 local)
  private val rows =
    readings(1L, "2024-03-08T00:00:00Z", 96) ++
    readings(2L, "2024-11-01T00:00:00Z", 96)

  private def toDf(rs: Seq[(Long, Long, Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    rs.toDF("user_id", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
      .select(col("user_id"), col("ts"), col("value"),
        lit("ctr").as("event_type"))
  }

  private def eventsDf: DataFrame = toDf(rows)

  /** Independent model: reset-aware deltas keyed to the local date of the
    * LATER sample; bar key = that date's first instant in NY. */
  private def modelBars: Map[(Long, Long), BigDecimal] =
    rows.groupBy(_._1).flatMap { case (uid, rs) =>
      rs.sortBy(_._2).sliding(2).collect {
        case Seq((_, pMs, pv), (_, ms, v)) =>
          val delta = if (v >= pv) BigDecimal(v) - BigDecimal(pv)
                      else BigDecimal(v)
          val day = Instant.ofEpochMilli(ms).atZone(NY).toLocalDate
          (uid, day.atStartOfDay(NY).toInstant.toEpochMilli) -> delta
      }.toSeq.groupBy(_._1).map { case (k, ds) =>
        k -> ds.map(_._2).sum
      }
    }

  private def dayKey(d: String): Long =
    LocalDate.parse(d).atStartOfDay(NY).toInstant.toEpochMilli

  test("per-local-day bars across BOTH 2024 NY DST transitions match the " +
    "sequential per-sample model exactly (23-hour and 25-hour days)") {
    val bars = EventsExt
      .energyBarsCalendar(eventsDf, unit = "DAY", tz = "America/New_York")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    bars shouldBe modelBars
    // the calendar is REAL: the spring-forward local day spans 23 hours,
    // the fall-back one 25 — no fixed grid reproduces these keys
    dayKey("2024-03-11") - dayKey("2024-03-10") shouldBe 23 * Hour
    dayKey("2024-11-04") - dayKey("2024-11-03") shouldBe 25 * Hour
    bars.keySet should contain((1L, dayKey("2024-03-10")))
    bars.keySet should contain((2L, dayKey("2024-11-03")))
  }

  test("bars tile the range: per-user calendar-day energies sum to the " +
    "full-span energyRange total (reset included)") {
    val s = spark
    import s.implicits._
    val bars = EventsExt
      .energyBarsCalendar(eventsDf, unit = "DAY", tz = "America/New_York")
      .groupBy(col("user_id"))
      .agg(sum(col("energy")).as("total"))
      .as[(Long, Double)].collect().toMap
    val full = EventsExt
      .energyRange(eventsDf, startMs = 0L, endMs = Long.MaxValue)
      .select(col("user_id"), col("energy"))
      .as[(Long, Double)].collect().toMap
    bars shouldBe full
  }

  /** Reset-aware deltas keyed to the calendar MONTH (in `zone`) of the
    * later sample — the month-grain sibling of [[modelBars]]. */
  private def modelMonths(rs: Seq[(Long, Long, Double)],
                          zone: ZoneId): Map[(Long, Long), BigDecimal] =
    rs.groupBy(_._1).flatMap { case (uid, urs) =>
      urs.sortBy(_._2).sliding(2).collect {
        case Seq((_, pMs, pv), (_, ms, v)) =>
          val delta = if (v >= pv) BigDecimal(v) - BigDecimal(pv)
                      else BigDecimal(v)
          val m = Instant.ofEpochMilli(ms).atZone(zone).toLocalDate
            .withDayOfMonth(1)
          (uid, m.atStartOfDay(zone).toInstant.toEpochMilli) -> delta
      }.toSeq.groupBy(_._1).map { case (k, ds) => k -> ds.map(_._2).sum }
    }

  // readings at :45 past each hour crossing the IST month boundary —
  // 2024-04-01 00:00 Asia/Kolkata is 2024-03-31T18:30Z, a HALF-hour UTC
  // instant no hourly bucket boundary ever hits
  private val IST = ZoneId.of("Asia/Kolkata")
  private val rowsK = (0 until 12).map { h =>
    (9L, Instant.parse("2024-03-31T12:45:00Z").toEpochMilli + h * Hour,
      10.0 + 0.25 * h)
  }

  test("HALF-HOUR-offset zone: monthly bars over 30-minute fine partials " +
    "match the per-sample model exactly — the documented exactness " +
    "domain of calendarBucket, made executable") {
    val bars = EventsExt
      .energyBarsCalendar(toDf(rowsK), unit = "MONTH",
        tz = "Asia/Kolkata", everyMs = 1800000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    bars shouldBe modelMonths(rowsK, IST)
    // the April bar is keyed at the true IST month start — a :30 instant
    bars.keySet should contain(
      (9L, Instant.parse("2024-03-31T18:30:00Z").toEpochMilli))
  }

  test("HALF-HOUR-offset zone: HOURLY fine partials DIVERGE — the bucket " +
    "straddling IST local midnight attributes wholly to the month of " +
    "its START (the documented boundary, pinned)") {
    val exact = modelMonths(rowsK, IST)
    val hourly = EventsExt
      .energyBarsCalendar(toDf(rowsK), unit = "MONTH", tz = "Asia/Kolkata")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    val march = (9L, Instant.parse("2024-02-29T18:30:00Z").toEpochMilli)
    val april = (9L, Instant.parse("2024-03-31T18:30:00Z").toEpochMilli)
    hourly should not be exact
    // the 18:45Z sample's delta sits in hourly bucket 18:00Z, which
    // starts BEFORE the 18:30Z month boundary → misattributed to March
    hourly(march) - exact(march) shouldBe BigDecimal("0.25")
    exact(april) - hourly(april) shouldBe BigDecimal("0.25")
  }

  test("tiered CALENDAR reads across BOTH DST transitions: local-" +
    "calendar-day coarse partials ∪ hourly fine, stitched at a local " +
    "midnight, reproduce the untiered day AND month bars bit-exactly") {
    val hourly = EventsExt.counterStatsPartialsHourly(eventsDf)
    val dayTier = EventsExt.counterStatsCalendarPartials(hourly,
      unit = "DAY", tz = "America/New_York")
    // Nov 3 local midnight (2024-11-03T04:00Z, EDT) — the fall-back
    // day itself sits in the FINE tier, every March day in the COARSE
    val cutoff = Instant.parse("2024-11-03T04:00:00Z").toEpochMilli
    val stitched = EventsExt.counterStatsCalendarTierPartials(
      hourly, dayTier, cutoffMs = cutoff, tz = "America/New_York")
    for (unit <- Seq("DAY", "MONTH")) {
      val tiered = EventsExt
        .energyBarsCalendarOfPartials(stitched, unit, "America/New_York")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val direct = EventsExt
        .energyBarsCalendar(eventsDf, unit, tz = "America/New_York")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      withClue(s"unit=$unit: ") { tiered shouldBe direct }
    }
    // a cutoff that is NOT a local midnight would let a calendar-day
    // bucket straddle the seam — rejected at plan build time
    intercept[IllegalArgumentException] {
      EventsExt.counterStatsCalendarTierPartials(hourly, dayTier,
        cutoffMs = cutoff + Hour, tz = "America/New_York")
    }.getMessage should include("local-midnight")
  }

  /** Reset-aware deltas keyed to the LOCAL DATE (in `zone`) of the later
    * sample — [[modelBars]] generalized to any zone; java.time's
    * `atStartOfDay(zone)` is the independent gap/overlap resolver the
    * product must reproduce. */
  private def modelDays(rs: Seq[(Long, Long, Double)],
                        zone: ZoneId): Map[(Long, Long), BigDecimal] =
    rs.groupBy(_._1).flatMap { case (uid, urs) =>
      urs.sortBy(_._2).sliding(2).collect {
        case Seq((_, pMs, pv), (_, ms, v)) =>
          val delta = if (v >= pv) BigDecimal(v) - BigDecimal(pv)
                      else BigDecimal(v)
          val day = Instant.ofEpochMilli(ms).atZone(zone).toLocalDate
          (uid, day.atStartOfDay(zone).toInstant.toEpochMilli) -> delta
      }.toSeq.groupBy(_._1).map { case (k, ds) => k -> ds.map(_._2).sum }
    }

  // America/Santiago: the one calendar shape NY and Kolkata cannot
  // exercise — DST transitions land exactly AT local midnight. Spring-
  // forward 2024-09-08: 00:00 -04 jumps to 01:00 -03, so the gap day's
  // local midnight DOES NOT EXIST (a 23-hour day). Fall-back 2024-04-07:
  // 00:00 -03 falls back to 23:00 -04, so Apr 6 is a 25-hour day whose
  // 23:00 hour repeats — but every local MIDNIGHT stays unambiguous.
  private val SCL = ZoneId.of("America/Santiago")
  private val rowsS =
    readings(3L, "2024-09-06T00:00:00Z", 96) ++ // spans the Sep 8 gap
    readings(4L, "2024-04-04T00:00:00Z", 96)    // spans the Apr 7 overlap

  private def sclDayKey(d: String): Long =
    LocalDate.parse(d).atStartOfDay(SCL).toInstant.toEpochMilli

  test("MIDNIGHT-GAP zone: per-local-day bars across Santiago's 2024 " +
    "spring-forward (AT midnight) match the sequential model — the gap " +
    "day's key is the day's true first instant, 04:00Z") {
    val bars = EventsExt
      .energyBarsCalendar(toDf(rowsS), unit = "DAY",
        tz = "America/Santiago")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    bars shouldBe modelDays(rowsS, SCL)
    // the gap day truncates to a local midnight that does not exist;
    // Spark's to_utc_timestamp resolves it like java.time — shift into
    // the gap's later offset — so the key is 2024-09-08T04:00:00Z (the
    // transition instant itself) and the day spans 23 hours
    sclDayKey("2024-09-08") shouldBe
      Instant.parse("2024-09-08T04:00:00Z").toEpochMilli
    sclDayKey("2024-09-09") - sclDayKey("2024-09-08") shouldBe 23 * Hour
    bars.keySet should contain((3L, sclDayKey("2024-09-08")))
    // fall-back AT midnight: Apr 6 spans 25 hours (the 23:00 hour
    // repeats), and its local midnight stays unambiguous
    sclDayKey("2024-04-07") - sclDayKey("2024-04-06") shouldBe 25 * Hour
    bars.keySet should contain((4L, sclDayKey("2024-04-06")))
  }

  test("MIDNIGHT-GAP zone: monthly bars across the transition match the " +
    "per-sample model, and the two-offset months key at their true " +
    "local starts (-04 September, -03 October)") {
    val rowsLong = readings(5L, "2024-08-30T00:00:00Z", 24 * 35)
    val bars = EventsExt
      .energyBarsCalendar(toDf(rowsLong), unit = "MONTH",
        tz = "America/Santiago")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    bars shouldBe modelMonths(rowsLong, SCL)
    bars.keySet should contain(
      (5L, Instant.parse("2024-09-01T04:00:00Z").toEpochMilli))
    bars.keySet should contain(
      (5L, Instant.parse("2024-10-01T03:00:00Z").toEpochMilli))
  }

  // Australia/Lord_Howe: BOTH boundary families at once — a half-hour
  // base offset (+10:30) whose DST shift is itself 30 MINUTES (+11), so
  // the 2024-10-06 spring-forward local day spans 23.5 hours and the
  // 2024-04-07 fall-back day 24.5 — fractional-hour day lengths no
  // whole-hour zone produces. Local midnights sit at :30 UTC before the
  // spring transition and :00 after, all on the 30-minute fine grid.
  private val LHI = ZoneId.of("Australia/Lord_Howe")
  private val rowsL =
    readings(6L, "2024-10-04T00:00:00Z", 96) ++ // spans the Oct 6 gap
    readings(7L, "2024-04-05T00:00:00Z", 96)    // spans the Apr 7 overlap

  private def lhiDayKey(d: String): Long =
    LocalDate.parse(d).atStartOfDay(LHI).toInstant.toEpochMilli

  test("the calendar tier stitch accepts a cutoff AT the gap day — the " +
    "resolved first instant (local 01:00) is the day's calendar key " +
    "and a legitimate seam; tiered ≡ untiered across it") {
    val hourly = EventsExt.counterStatsPartialsHourly(toDf(rowsS))
    val dayTier = EventsExt.counterStatsCalendarPartials(hourly,
      unit = "DAY", tz = "America/Santiago")
    // the gap day's first instant: 2024-09-08T04:00Z, local time 01:00
    // -03 — a literal local-midnight test would wrongly reject it
    val cutoff = Instant.parse("2024-09-08T04:00:00Z").toEpochMilli
    val stitched = EventsExt.counterStatsCalendarTierPartials(
      hourly, dayTier, cutoffMs = cutoff, tz = "America/Santiago")
    for (unit <- Seq("DAY", "MONTH")) {
      val tiered = EventsExt
        .energyBarsCalendarOfPartials(stitched, unit, "America/Santiago")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val direct = EventsExt
        .energyBarsCalendar(toDf(rowsS), unit, tz = "America/Santiago")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      withClue(s"unit=$unit: ") { tiered shouldBe direct }
    }
    // a cutoff that is NOT a day's first instant stays rejected
    intercept[IllegalArgumentException] {
      EventsExt.counterStatsCalendarTierPartials(hourly, dayTier,
        cutoffMs = cutoff + Hour, tz = "America/Santiago")
    }.getMessage should include("local-midnight")
  }

  test("FRACTIONAL-HOUR DST zone: per-local-day bars across BOTH Lord " +
    "Howe 2024 transitions over 30-minute fine partials match the " +
    "sequential model — 23.5-hour and 24.5-hour days") {
    val bars = EventsExt
      .energyBarsCalendar(toDf(rowsL), unit = "DAY",
        tz = "Australia/Lord_Howe", everyMs = 1800000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    bars shouldBe modelDays(rowsL, LHI)
    // the spring-forward day is 23.5 hours, the fall-back one 24.5 —
    // fractional lengths whose midnights only a half-hour grid contains
    lhiDayKey("2024-10-07") - lhiDayKey("2024-10-06") shouldBe
      23 * Hour + Hour / 2
    lhiDayKey("2024-04-08") - lhiDayKey("2024-04-07") shouldBe
      24 * Hour + Hour / 2
    // pre-transition midnights are :30 UTC instants, post :00
    lhiDayKey("2024-10-06") % Hour shouldBe Hour / 2
    lhiDayKey("2024-10-07") % Hour shouldBe 0L
    bars.keySet should contain((6L, lhiDayKey("2024-10-06")))
    bars.keySet should contain((7L, lhiDayKey("2024-04-07")))
  }

  test("FRACTIONAL-HOUR DST zone: monthly bars across the transition " +
    "match the per-sample model; HOURLY fine partials cannot express " +
    "the :30 month boundary and DIVERGE") {
    // samples at :45 past each hour — one lands INSIDE the hour that
    // straddles the 13:30Z month boundary, which is what the hourly
    // grid misattributes (on-the-hour samples would mask it)
    val rowsLong = readings(8L, "2024-09-27T00:45:00Z", 24 * 35)
    val exact = EventsExt
      .energyBarsCalendar(toDf(rowsLong), unit = "MONTH",
        tz = "Australia/Lord_Howe", everyMs = 1800000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    exact shouldBe modelMonths(rowsLong, LHI)
    // October starts at a :30 instant (+10:30), November at :00 (+11)
    exact.keySet should contain(
      (8L, Instant.parse("2024-09-30T13:30:00Z").toEpochMilli))
    exact.keySet should contain(
      (8L, Instant.parse("2024-10-31T13:00:00Z").toEpochMilli))
    val hourly = EventsExt
      .energyBarsCalendar(toDf(rowsLong), unit = "MONTH",
        tz = "Australia/Lord_Howe")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    hourly should not be exact
  }

  // America/Havana: the AMBIGUOUS-midnight zone — the mirror of
  // Santiago's gap. The 2024-11-03 fall-back lands 01:00 -04 → 00:00
  // -05, so the 00:00–01:00 wall hour occurs TWICE and the 25-hour
  // day's local midnight is AMBIGUOUS; java.time (and Spark's
  // to_utc_timestamp) resolves it to the EARLIER offset. Havana's
  // spring-forward (2024-03-10) is also AT midnight (00:00 -05 jumps
  // to 01:00 -04) — both midnight anomalies in one zone.
  private val HAV = ZoneId.of("America/Havana")
  private val rowsH =
    readings(10L, "2024-11-01T00:00:00Z", 96) ++ // spans the Nov 3 overlap
    readings(11L, "2024-03-08T00:00:00Z", 96)    // spans the Mar 10 gap

  private def havDayKey(d: String): Long =
    LocalDate.parse(d).atStartOfDay(HAV).toInstant.toEpochMilli

  test("AMBIGUOUS-midnight zone: per-local-day bars across Havana's " +
    "2024 fall-back TO midnight match the sequential model — the " +
    "25-hour day's key is the EARLIER offset's midnight, 04:00Z") {
    val bars = EventsExt
      .energyBarsCalendar(toDf(rowsH), unit = "DAY", tz = "America/Havana")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    bars shouldBe modelDays(rowsH, HAV)
    // the fall-back day's local midnight occurs twice (00:00 -04 at
    // 04:00Z, then 00:00 -05 at 05:00Z); java.time resolves the
    // ambiguity to the EARLIER offset, so the key is 04:00Z and the
    // day spans 25 hours
    havDayKey("2024-11-03") shouldBe
      Instant.parse("2024-11-03T04:00:00Z").toEpochMilli
    havDayKey("2024-11-04") - havDayKey("2024-11-03") shouldBe 25 * Hour
    bars.keySet should contain((10L, havDayKey("2024-11-03")))
    // Havana's spring-forward is ALSO at midnight: the Mar 10 midnight
    // does not exist, the key is the gap's resolved first instant
    // (01:00 -04 = 05:00Z) and the day spans 23 hours
    havDayKey("2024-03-10") shouldBe
      Instant.parse("2024-03-10T05:00:00Z").toEpochMilli
    havDayKey("2024-03-11") - havDayKey("2024-03-10") shouldBe 23 * Hour
    bars.keySet should contain((11L, havDayKey("2024-03-10")))
  }

  test("the calendar tier stitch accepts a cutoff AT the ambiguous day " +
    "— the earlier-offset midnight (04:00Z) is the day's calendar key " +
    "and a legitimate seam; the LATER occurrence (05:00Z) is rejected; " +
    "tiered ≡ untiered across it") {
    val hourly = EventsExt.counterStatsPartialsHourly(toDf(rowsH))
    val dayTier = EventsExt.counterStatsCalendarPartials(hourly,
      unit = "DAY", tz = "America/Havana")
    // the ambiguous day's first instant: 2024-11-03T04:00Z, the FIRST
    // of the two local midnights
    val cutoff = Instant.parse("2024-11-03T04:00:00Z").toEpochMilli
    val stitched = EventsExt.counterStatsCalendarTierPartials(
      hourly, dayTier, cutoffMs = cutoff, tz = "America/Havana")
    for (unit <- Seq("DAY", "MONTH")) {
      val tiered = EventsExt
        .energyBarsCalendarOfPartials(stitched, unit, "America/Havana")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val direct = EventsExt
        .energyBarsCalendar(toDf(rowsH), unit, tz = "America/Havana")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      withClue(s"unit=$unit: ") { tiered shouldBe direct }
    }
    // the SECOND occurrence of the repeated midnight (00:00 -05 =
    // 05:00Z) is a real local midnight on the wall clock but NOT the
    // day's first instant — a day bucket would straddle it; rejected
    intercept[IllegalArgumentException] {
      EventsExt.counterStatsCalendarTierPartials(hourly, dayTier,
        cutoffMs = cutoff + Hour, tz = "America/Havana")
    }.getMessage should include("local-midnight")
  }

  test("FRACTIONAL-HOUR DST zone through the tier stitch: a cutoff " +
    "whose :00-UTC alignment differs from the coarse tier's :30-UTC " +
    "pre-transition midnights — tiered ≡ untiered across the " +
    "transition (the seam Kolkata's fixed offset cannot exercise)") {
    val fine30 = EventsExt.counterStatsPartialsHourly(toDf(rowsL),
      everyMs = 1800000L)
    val dayTier = EventsExt.counterStatsCalendarPartials(fine30,
      unit = "DAY", tz = "Australia/Lord_Howe")
    // 2024-10-08 local midnight = Oct 7 13:00Z (+11, post-transition,
    // :00-aligned) while every coarse-tier day before the Oct 6
    // spring-forward starts at a :30-UTC instant (+10:30)
    val cutoff = Instant.parse("2024-10-07T13:00:00Z").toEpochMilli
    cutoff shouldBe lhiDayKey("2024-10-08")
    cutoff % Hour shouldBe 0L
    lhiDayKey("2024-10-05") % Hour shouldBe Hour / 2
    val stitched = EventsExt.counterStatsCalendarTierPartials(
      fine30, dayTier, cutoffMs = cutoff, tz = "Australia/Lord_Howe")
    for (unit <- Seq("DAY", "MONTH")) {
      val tiered = EventsExt
        .energyBarsCalendarOfPartials(stitched, unit,
          "Australia/Lord_Howe")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val direct = EventsExt
        .energyBarsCalendar(toDf(rowsL), unit, tz = "Australia/Lord_Howe",
          everyMs = 1800000L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      withClue(s"unit=$unit: ") { tiered shouldBe direct }
    }
  }

  // Pacific/Chatham: the QUARTER-hour rung of the granularity ladder — a
  // +12:45 base offset with a one-hour DST shift (+13:45 from the last
  // Sunday of September), so every local midnight is a :15-UTC instant:
  // 11:15Z before the 2024-09-29 spring-forward, 10:15Z after. Neither
  // the hourly nor the 30-MINUTE grid contains these; only 15-minute
  // fine partials keep the calendar regroup exact.
  private val CHT = ZoneId.of("Pacific/Chatham")
  private val rowsC =
    readings(12L, "2024-09-26T00:00:00Z", 96) ++ // spans the Sep 29 gap
    readings(13L, "2024-04-04T00:00:00Z", 96)    // spans the Apr 7 overlap

  private def chtDayKey(d: String): Long =
    LocalDate.parse(d).atStartOfDay(CHT).toInstant.toEpochMilli

  test("QUARTER-hour-offset zone: per-local-day bars across BOTH Chatham " +
    "2024 transitions over 15-minute fine partials match the sequential " +
    "model — 23-hour and 25-hour days keyed at :15-UTC midnights") {
    val bars = EventsExt
      .energyBarsCalendar(toDf(rowsC), unit = "DAY",
        tz = "Pacific/Chatham", everyMs = 900000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    bars shouldBe modelDays(rowsC, CHT)
    // the spring-forward local day spans 23 hours (02:45→03:45 skip),
    // the fall-back one 25
    chtDayKey("2024-09-30") - chtDayKey("2024-09-29") shouldBe 23 * Hour
    chtDayKey("2024-04-08") - chtDayKey("2024-04-07") shouldBe 25 * Hour
    // EVERY Chatham midnight is a :15-mod-30-minute UTC instant — on the
    // 15-minute grid but never on the 30-minute (or hourly) one
    chtDayKey("2024-09-29") shouldBe
      Instant.parse("2024-09-28T11:15:00Z").toEpochMilli
    chtDayKey("2024-09-30") shouldBe
      Instant.parse("2024-09-29T10:15:00Z").toEpochMilli
    chtDayKey("2024-09-29") % (Hour / 2) shouldBe Hour / 4
    chtDayKey("2024-09-30") % (Hour / 2) shouldBe Hour / 4
    bars.keySet should contain((12L, chtDayKey("2024-09-29")))
    bars.keySet should contain((13L, chtDayKey("2024-04-07")))
  }

  // readings at :20 past each hour — one lands INSIDE the quarter-hour
  // (10:15Z, 10:30Z) that the 30-minute grid's 10:00Z bucket straddles
  // at the October month boundary (on-the-hour or :45 samples would
  // mask it)
  private val rowsCm = readings(14L, "2024-09-27T00:20:00Z", 24 * 7)

  test("QUARTER-hour-offset zone: monthly bars over 15-minute fine " +
    "partials match the per-sample model; even 30-MINUTE partials " +
    "cannot express the :15 month boundary and DIVERGE") {
    val exact = EventsExt
      .energyBarsCalendar(toDf(rowsCm), unit = "MONTH",
        tz = "Pacific/Chatham", everyMs = 900000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    exact shouldBe modelMonths(rowsCm, CHT)
    // October starts at 10:15Z (+13:45), September started at 11:15Z
    // (+12:45) — both quarter-hour instants
    val sep = (14L, Instant.parse("2024-08-31T11:15:00Z").toEpochMilli)
    val oct = (14L, Instant.parse("2024-09-30T10:15:00Z").toEpochMilli)
    exact.keySet should contain(oct)
    val thirty = EventsExt
      .energyBarsCalendar(toDf(rowsCm), unit = "MONTH",
        tz = "Pacific/Chatham", everyMs = 1800000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    thirty should not be exact
    // the 10:20Z sample's delta sits in 30-minute bucket 10:00Z, which
    // starts BEFORE the 10:15Z month boundary → misattributed to
    // September; the 15-minute bucket 10:15Z keys it correctly
    thirty(sep) - exact(sep) shouldBe BigDecimal("0.25")
    exact(oct) - thirty(oct) shouldBe BigDecimal("0.25")
  }

  test("QUARTER-hour zone through the tier stitch: the cutoff is a " +
    ":15-UTC instant no coarser grid contains, and its alignment " +
    "(10:15Z) differs from every pre-transition coarse day's (11:15Z) " +
    "— tiered ≡ untiered across the transition") {
    val fine15 = EventsExt.counterStatsPartialsHourly(toDf(rowsC),
      everyMs = 900000L)
    val dayTier = EventsExt.counterStatsCalendarPartials(fine15,
      unit = "DAY", tz = "Pacific/Chatham")
    // 2024-09-30 local midnight = Sep 29 10:15Z (+13:45,
    // post-transition) while every coarse-tier day before the Sep 29
    // spring-forward starts at an 11:15Z-aligned instant (+12:45)
    val cutoff = Instant.parse("2024-09-29T10:15:00Z").toEpochMilli
    cutoff shouldBe chtDayKey("2024-09-30")
    cutoff % (Hour / 2) shouldBe Hour / 4
    val stitched = EventsExt.counterStatsCalendarTierPartials(
      fine15, dayTier, cutoffMs = cutoff, tz = "Pacific/Chatham")
    for (unit <- Seq("DAY", "MONTH")) {
      val tiered = EventsExt
        .energyBarsCalendarOfPartials(stitched, unit, "Pacific/Chatham")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val direct = EventsExt
        .energyBarsCalendar(toDf(rowsC), unit, tz = "Pacific/Chatham",
          everyMs = 900000L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      withClue(s"unit=$unit: ") { tiered shouldBe direct }
    }
  }

  test("statistics calendar partials share the bucket mapping: the " +
    "spring-forward day's bucket holds exactly its 23 local hours") {
    val parts = EventsExt.statisticsCalendarPartials(
      EventsExt.statisticsPartialsHourly(eventsDf),
      unit = "DAY", tz = "America/New_York")
    val mar10 = parts
      .filter(col("bucket_ms") === dayKey("2024-03-10"))
      .select(col("cov")).collect()
    // covered ms = the LOCF hold over the whole 23-hour local day (the
    // hold chain has a sample at every hour boundary)
    mar10.map(_.getLong(0)).sum shouldBe 23 * Hour
  }
}
