package graft

import graft.ext.EventsExt
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for BOTH compactors: over random event streams,
  * coarse factors and (fine-aligned) grid offsets, compacting the fine
  * partials must equal computing at the coarse step directly — for the
  * offset grids via the shift twin (bucket_off(t) = bucket_epoch(t−off) +
  * off, and every statistic is shift-invariant). Exact equality: BIGINT /
  * DECIMAL sums regroup associatively, extremes are idempotent, and the
  * cumulative counter sum re-folds the identical values in the same
  * order. */
class StatisticsCompactPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = 1704067200000L
  private val hour = 3600000L

  private val genCase: Gen[(List[(Long, Long, Long, Double)], Int, Long)] =
    for {
      n <- Gen.chooseNum(0, 40)
      rows <- Gen.listOfN(n, for {
        user <- Gen.chooseNum(1L, 3L)
        ms <- Gen.chooseNum(0L, 95L).map(t0 + _ * 300000L)
        v <- Gen.chooseNum(-200, 400).map(_ / 4.0)
      } yield (user, ms, v))
      factor <- Gen.oneOf(2, 4, 24)
      offH <- Gen.chooseNum(0L, 23L)
    } yield (rows.zipWithIndex.map { case ((u, ms, v), i) =>
      (i.toLong + 1, u, ms, v)
    }, factor, offH * hour)

  private def eventsDf(rows: Seq[(Long, Long, Long, Double)],
                       shiftMs: Long = 0L): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "ms", "value")
      .withColumn("event_type", concat(lit("t"), col("user_id")))
      .selectExpr("event_id", "user_id", "event_type", "value",
        s"timestamp_millis(ms - $shiftMs) AS ts")
  }

  private def canonStat(df: DataFrame, shiftBack: Long = 0L) =
    df.collect().map(r => (r.getString(0), r.getLong(1) + shiftBack) ->
      ((Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap

  private def canonCounter(df: DataFrame, shiftBack: Long = 0L) =
    df.collect().map(r => (r.getLong(0), r.getLong(1) + shiftBack) ->
      ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap

  test("statisticsCompact(fine, factor, off) ≡ statisticsHourly on " +
    "shifted events at the coarse step, EXACT (property)") {
    val prop = Prop.forAllNoShrink(genCase) { case (rows, factor, off) =>
      if (rows.isEmpty) Prop.passed
      else {
        val compacted = EventsExt.statisticsCompact(
          EventsExt.statisticsPartialsHourly(eventsDf(rows), hour),
          factor, hour, off)
        val direct = EventsExt.statisticsHourly(
          eventsDf(rows, shiftMs = off), factor * hour)
        val ok = canonStat(compacted) == canonStat(direct, shiftBack = off)
        Prop.propBoolean(ok) :|
          s"stat compact mismatch factor=$factor off=$off rows=$rows"
      }
    }
    PropCheck.check(prop, minSuccessful = 12, tag = "StatisticsCompactPropSpec#1")
  }

  test("counterStatsCompact(fine, factor, off) ≡ counterStatsHourly on " +
    "shifted events at the coarse step, EXACT (property)") {
    val prop = Prop.forAllNoShrink(genCase) { case (rows, factor, off) =>
      if (rows.isEmpty) Prop.passed
      else {
        val compacted = EventsExt.counterStatsCompact(
          EventsExt.counterStatsPartialsHourly(eventsDf(rows), hour),
          factor, hour, off)
        val direct = EventsExt.counterStatsHourly(
          eventsDf(rows, shiftMs = off), factor * hour)
        val ok =
          canonCounter(compacted) == canonCounter(direct, shiftBack = off)
        Prop.propBoolean(ok) :|
          s"counter compact mismatch factor=$factor off=$off rows=$rows"
      }
    }
    PropCheck.check(prop, minSuccessful = 12, tag = "StatisticsCompactPropSpec#2")
  }

  test("hierarchical compaction is ASSOCIATIVE for both families: " +
    "compactPartials by a then by b ≡ compact by a·b in one step, EXACT " +
    "(property — the tier-ladder contract)") {
    val genChain: Gen[(List[(Long, Long, Long, Double)], Int, Int)] = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        user <- Gen.chooseNum(1L, 3L)
        ms <- Gen.chooseNum(0L, 95L).map(t0 + _ * 300000L)
        v <- Gen.chooseNum(-200, 400).map(_ / 4.0)
      } yield (user, ms, v))
      a <- Gen.oneOf(2, 3, 4)
      b <- Gen.oneOf(2, 6)
    } yield (rows.zipWithIndex.map { case ((u, ms, v), i) =>
      (i.toLong + 1, u, ms, v)
    }, a, b)
    val prop = Prop.forAllNoShrink(genChain) { case (rows, a, b) =>
      val statFine = EventsExt.statisticsPartialsHourly(eventsDf(rows), hour)
      val statChained = EventsExt.statisticsCompact(
        EventsExt.statisticsCompactPartials(statFine, a, hour),
        b, hour * a)
      val statOne = EventsExt.statisticsCompact(statFine, a * b, hour)
      val counterFine =
        EventsExt.counterStatsPartialsHourly(eventsDf(rows), hour)
      val counterChained = EventsExt.counterStatsCompact(
        EventsExt.counterStatsCompactPartials(counterFine, a, hour),
        b, hour * a)
      val counterOne = EventsExt.counterStatsCompact(counterFine, a * b, hour)
      val ok = canonStat(statChained) == canonStat(statOne) &&
        canonCounter(counterChained) == canonCounter(counterOne)
      Prop.propBoolean(ok) :|
        s"chained compact mismatch a=$a b=$b rows=$rows"
    }
    PropCheck.check(prop, minSuccessful = 12, tag = "StatisticsCompactPropSpec#3")
  }
}
