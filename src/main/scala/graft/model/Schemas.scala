package graft.model

import org.apache.spark.sql.types._

/** Schemas for the Home-Assistant recorder slice the reference reads
  * (reference: sqllite2influxdb.py:82-90 SELECT list; :103 row unpack) and
  * the Influx point model it writes (sqllite2influxdb.py:114-141).
  *
  * See SURVEY.md §1. All timestamps are carried as epoch values pinned to
  * UTC (quirk Q6): `last_updated_ts` DOUBLE epoch-seconds mirrors the
  * recorder REAL column; the oracle-facing views use ms-truncated BIGINT
  * epochs for exact cross-engine comparison.
  */
object Schemas {

  /** `states` slice (sqllite2influxdb.py:83-86). */
  val states: StructType = StructType(Seq(
    StructField("metadata_id", IntegerType, nullable = false),
    StructField("attributes_id", IntegerType, nullable = true),
    StructField("state", StringType, nullable = true),
    StructField("last_updated_ts", DoubleType, nullable = false)))

  /** `states_meta` (sqllite2influxdb.py:86): deduplicated entity ids. */
  val statesMeta: StructType = StructType(Seq(
    StructField("metadata_id", IntegerType, nullable = false),
    StructField("entity_id", StringType, nullable = false)))

  /** `state_attributes` (sqllite2influxdb.py:85): deduplicated JSON blobs. */
  val stateAttributes: StructType = StructType(Seq(
    StructField("attributes_id", IntegerType, nullable = false),
    StructField("shared_attrs", StringType, nullable = true)))

  /** Influx point (SURVEY.md §1.4): numeric and string fields carried as two
    * typed maps instead of an Any-typed column; tags always strings.
    * measurement is data-dependent (unit of measurement, Q1/F4). */
  val influxPoint: StructType = StructType(Seq(
    StructField("measurement", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType), nullable = false),
    StructField("fields_num", MapType(StringType, DoubleType), nullable = false),
    StructField("fields_str", MapType(StringType, StringType), nullable = false),
    StructField("time_ms", LongType, nullable = false)))
}

/** Typed rows for Dataset[T] paths and test fixtures. */
final case class StateRow(metadata_id: Int, attributes_id: Option[Int],
                          state: String, last_updated_ts: Double)
final case class StatesMetaRow(metadata_id: Int, entity_id: String)
final case class StateAttributesRow(attributes_id: Int, shared_attrs: String)

/** One Influx point; `fields_num`/`fields_str` mirror the reference's
  * float-vs-string field dispatch (sqllite2influxdb.py:122-139, F7/Q3). */
final case class InfluxPoint(measurement: String,
                             tags: Map[String, String],
                             fields_num: Map[String, Double],
                             fields_str: Map[String, String],
                             time_ms: Long)
