package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A1/S2: the incremental-backfill watermark — the sink's OLDEST timestamp
  * (reference delegates this to Flux: range → filter → sort asc → limit 1,
  * sqllite2influxdb.py:57-66; that is exactly a min-aggregate).
  *
  * Quirk Q1: the reference filters `_measurement == "units"`, a literal that
  * never matches measurements it writes, so its watermark is usually NULL and
  * every run re-exports everything. We implement the *intended* semantics —
  * min(_time) over points tagged source=HA — and keep the bug behind
  * `bugCompatUnitsFilter` for fidelity experiments.
  */
object Watermark {

  /** min(time_ms) over a points DataFrame (columns per Schemas.influxPoint).
    * Spark plans a partial+final HashAggregate — no shuffle of data rows,
    * one long per partition crosses the exchange. */
  def oldestPointMs(points: DataFrame, bugCompatUnitsFilter: Boolean = false): Option[Long] = {
    val scoped =
      if (bugCompatUnitsFilter) points.filter(col("measurement") === "units")
      else points.filter(element_at(col("tags"), "source") === "HA")
    val r = scoped.agg(min(col("time_ms")).as("watermark_ms")).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** The same aggregate as a 1-row DataFrame (for the oracle-gated query).
    * Literal translation of the Flux `sort |> limit 1` is
    * `orderBy(time).limit(1)` → TakeOrderedAndProject; the min-agg form is
    * the cheaper plan and what we use. */
  def oldestEventMs(spark: SparkSession, dir: String, eventType: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === eventType)
      .agg(min(unix_millis(date_trunc("MILLISECOND", col("ts")))).as("watermark_ms"))

  /** Per-entity resume table — the scaled generalization of the
    * reference's single global watermark: at fleet size one slow entity
    * must not pin the whole backfill, so each entity resumes from its own
    * bound. One partial-aggregated shuffle on metadata_id-sized keys; the
    * entity dimension joins broadcast (device registry ≪ state history,
    * same justification as the core pipeline's J1). */
  def perEntityWatermarks(states: DataFrame, meta: DataFrame): DataFrame =
    states.join(broadcast(meta.select(col("metadata_id"), col("entity_id"))),
        Seq("metadata_id"))
      .groupBy(col("entity_id"))
      .agg(min(col("last_updated_ms")).as("oldest_ms"),
        max(col("last_updated_ms")).as("newest_ms"),
        count(lit(1)).as("n_points"))
}
