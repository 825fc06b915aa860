package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic HA-recorder-shaped views derived from the driver `events`
  * fixture (FIXTURES.md §3: user_id→entity, value→state, ts→last_updated).
  *
  * Each derivation is chosen to be expressible 1:1 in ANSI SQL so the DuckDB
  * oracle can build the exact same trio (see SparkEntry.oracleSql HA_* CTEs).
  * The derivations intentionally cover every quirk branch of SURVEY.md §2.12:
  * junk states (P3), non-numeric and negative states (Q3), missing
  * attributes_id (J2 null path), dotted entity ids (F1), missing/empty units
  * (F4), missing friendly_name (Q5), malformed JSON (F2), blocklist keys (P5).
  *
  * Times are ms-truncated epoch BIGINTs — exact in both engines; the
  * reference's REAL epoch-seconds (sqllite2influxdb.py:83,116) is recovered
  * via `last_updated_ms / 1000.0` when a DOUBLE view is needed.
  */
object HaViews {

  /** value → state string exactly as `CAST(CAST(v AS DECIMAL(12,2)) AS STRING)`
    * renders it in both Spark and DuckDB ("40.34", "0.00"). */
  private def valueStr(v: Column): Column = v.cast(DecimalType(12, 2)).cast("string")

  /** states: one row per event.
    *  - error    → "unavailable" (junk, filtered by P3)
    *  - signup   → "on" / "unknown" alternating (non-numeric / junk)
    *  - view     → "-<value>" (negative-looking; lands on the string-field
    *               path per quirk Q3 — reference isdigit() rejects '-')
    *  - others   → decimal-rendered value (numeric path, F7)
    * attributes_id is NULL for event_id % 7 == 0 (exercises J2 left-join miss).
    */
  def states(events: DataFrame): DataFrame = events.select(
    col("event_id"),
    col("user_id").cast("int").as("metadata_id"),
    when(col("event_id") % 7 === 0, lit(null))
      .otherwise((col("event_id") % 50).cast("int")).as("attributes_id"),
    when(col("event_type") === "error", lit("unavailable"))
      .when(col("event_type") === "signup",
        when(col("event_id") % 2 === 0, lit("on")).otherwise(lit("unknown")))
      .when(col("event_type") === "view", concat(lit("-"), valueStr(col("value"))))
      .otherwise(valueStr(col("value"))).as("state"),
    unix_millis(date_trunc("MILLISECOND", col("ts"))).as("last_updated_ms"))

  /** states_meta: one row per distinct user; users with metadata_id % 13 == 3
    * are absent so the J1 inner join actually drops rows. Every 5th entity id
    * has a dotted object part ("sensor.esp.<n>") to exercise the
    * first-dot-only split (F1, sqllite2influxdb.py:106). */
  def statesMeta(events: DataFrame): DataFrame = events
    .select(col("user_id").cast("int").as("metadata_id")).distinct()
    .filter(col("metadata_id") % 13 =!= 3)
    .withColumn("entity_id",
      when(col("metadata_id") % 5 === 0,
        concat(lit("sensor.esp."), col("metadata_id")))
        .otherwise(concat(lit("sensor.device_"), col("metadata_id"))))

  /** state_attributes: 50 synthetic JSON blobs keyed 0..49.
    *  - id % 4 picks unit_of_measurement: "C" / "pct" / "" / key absent  (F4)
    *  - id % 6 == 5 omits friendly_name                                   (Q5)
    *  - id == 49 is malformed JSON ("not json")                           (F2)
    *  - always carries: temperature "<id>.5" (force-float allowlist key),
    *    battery "<id*7 mod 100>" (numeric-looking string), icon "mdi:x"
    *    (plain string), id "<id>" (blocklisted key, P5)
    */
  /** statistics: the recorder's LONG-TERM-STATISTICS table shape, one row
    * per (sensor, hour) — the OTHER table a real HA migration moves
    * beside `states` (public recorder schema: metadata_id, start_ts,
    * mean, min, max, state, sum). Derived deterministically from events:
    * mean/min/max over the bucket (plain mean here — the time-weighted
    * long-term mean itself is computed and gated by
    * `EventsExt.statisticsHourly`; this VIEW only needs recorder-shaped
    * rows the migration pipeline can join and project, with a small
    * oracle CTE), state = last reading, sum = the cumulative reset-aware
    * increase of the counter contract. DECIMAL accumulation, one terminal
    * division for the mean, BIGINT epoch-ms start. */
  def statistics(events: DataFrame): DataFrame = {
    // null readings never enter the recorder's statistics chain — the same
    // value-not-null posture the whole statistics family (batch AND
    // streaming) shares
    val s = events.filter(col("value").isNotNull).select(
        col("user_id").cast("int").as("metadata_id"),
        unix_millis(date_trunc("MILLISECOND", col("ts"))).as("ms"),
        col("value").cast(DecimalType(18, 2)).as("v0"))
      .groupBy(col("metadata_id"), col("ms")).agg(max(col("v0")).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("metadata_id")).orderBy(col("ms").asc)
    val g = s.withColumn("pv", lag(col("v"), 1).over(w))
      .groupBy(col("metadata_id"),
        (expr("ms div 3600000") * 3600000L).as("start_ts_ms"))
      .agg(
        (sum(col("v")).cast("double") / count(lit(1))).as("mean"),
        min(col("v")).cast("double").as("min"),
        max(col("v")).cast("double").as("max"),
        max_by(col("v"), col("ms")).cast("double").as("state"),
        sum(when(col("pv").isNull, lit(0).cast(DecimalType(18, 2)))
          .otherwise(when(col("v") >= col("pv"), col("v") - col("pv"))
            .otherwise(col("v")))).as("inc_d"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("metadata_id")).orderBy(col("start_ts_ms").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    g.withColumn("sum", sum(col("inc_d")).over(wc).cast("double"))
      .drop("inc_d")
  }

  /** statistics_meta: one row per distinct sensor; ids % 11 == 7 are
    * absent (the inner join must drop rows); unit cycles kWh / W / NULL;
    * has_mean alternates — HA's mean-type vs sum-type sensor split, which
    * the migration pipeline must respect (a sum-type sensor publishes
    * state/sum, never mean/min/max, and vice versa). The recorder carries
    * BOTH booleans: has_sum here is true for most odd ids but false for
    * odd ids ≡ 5 (mod 7), so some sensors are NEITHER mean- nor sum-typed
    * — the migration must publish nothing for those, exactly the
    * recorder's own column usage. */
  def statisticsMeta(events: DataFrame): DataFrame = events
    .select(col("user_id").cast("int").as("metadata_id")).distinct()
    .filter(col("metadata_id") % 11 =!= 7)
    .select(col("metadata_id"),
      concat(lit("sensor.energy_"), col("metadata_id")).as("statistic_id"),
      when(col("metadata_id") % 3 === 0, lit("kWh"))
        .when(col("metadata_id") % 3 === 1, lit("W"))
        .otherwise(lit(null).cast("string")).as("unit_of_measurement"),
      (col("metadata_id") % 2 === 0).as("has_mean"),
      (col("metadata_id") % 2 === 1 && col("metadata_id") % 7 =!= 5)
        .as("has_sum"))

  def stateAttributes(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val ids = spark.range(50).select(col("id").cast("int").as("attributes_id"))
    val i = col("attributes_id")
    val unitPart = when(i % 4 === 3, lit(""))
      .otherwise(concat(lit(",\"unit_of_measurement\":\""),
        when(i % 4 === 0, lit("C")).when(i % 4 === 1, lit("pct"))
          .otherwise(lit("")),
        lit("\"")))
    val namePart = when(i % 6 === 5, lit(""))
      .otherwise(concat(lit("\"friendly_name\":\"Device "), i, lit("\",")))
    val json = concat(
      lit("{"), namePart,
      lit("\"temperature\":\""), i, lit(".5\""), unitPart,
      lit(",\"battery\":\""), (i * 7) % 100, lit("\""),
      lit(",\"icon\":\"mdi:x\",\"id\":\""), i, lit("\"}"))
    ids.withColumn("shared_attrs",
      when(i === 49, lit("not json")).otherwise(json))
  }
}
