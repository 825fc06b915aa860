package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming twins of the batch event queries (SURVEY §2.10).
  * The reference's `while True: fetchmany(BATCH_SIZE)` pull loop
  * (sqllite2influxdb.py:183-189) is exactly a micro-batch source; its
  * watermark-resume behavior maps to checkpointed offsets + withWatermark.
  *
  * These take any streaming DataFrame with the `events` schema (tests feed a
  * MemoryStream; production would readStream from files/Kafka/Delta — JDBC
  * is not a streaming source, SURVEY §2.10-T1).
  */
object StreamingEvents {

  /** X6 streaming: tumbling 1-hour windows per event_type with a 2-hour
    * event-time watermark for state eviction. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))

  /** Streaming dedup on event_id within the watermark horizon (T3: the
    * batch reference has no in-run dedup; the sink's point-overwrite
    * idempotence covers replays — this is the explicit streaming version). */
  def dedupedStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
}
