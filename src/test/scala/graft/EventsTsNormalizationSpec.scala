package graft

import graft.etl.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins BOTH branches of Tables.events' ts normalization (the fixture's
  * physical type has flipped across driver drops — TIMESTAMP(NANOS) read
  * as a raw long under the legacy conf, and TIMESTAMP(MICROS)
  * isAdjustedToUTC=false read as TIMESTAMP_NTZ): synthesized local
  * fixtures of each encoding must decode to the SAME wall-clock
  * TimestampType column, so the next format drop cannot silently change
  * event-time semantics. */
class EventsTsNormalizationSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  // 2024-01-01T00:00:07.123456789Z — sub-microsecond tail exercises the
  // nanos→micros floor
  private val epochSec = 1704067207L
  private val nanosOfSec = 123456789L
  private val wantMicros = epochSec * 1000000L + nanosOfSec / 1000 // floored

  private def restSchema = Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("props", StringType))
  private def restCells = Seq(1L, 7L, "click", 1.5, """{"k":"v"}""")

  private def writeFixture(dir: String, tsField: StructField, tsCell: Any): Unit = {
    val schema = StructType(StructField("event_id", LongType) +:
      tsField +: restSchema.tail)
    val row = Row.fromSeq(1L +: tsCell +: restCells.tail)
    spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("nanos-long fixture: raw INT64 ts floors to microseconds") {
    // TIMESTAMP(NANOS) under spark.sql.legacy.parquet.nanosAsLong=true
    // surfaces as LongType — a plain INT64 column is schema-identical, so
    // it exercises exactly the branch the real nanos drop hits
    val dir = java.nio.file.Files.createTempDirectory("ts-nanos").toString
    writeFixture(dir, StructField("ts", LongType),
      epochSec * 1000000000L + nanosOfSec)
    val got = Tables.events(spark, dir)
    got.schema("ts").dataType shouldBe TimestampType
    got.select(unix_micros(col("ts"))).head().getLong(0) shouldBe wantMicros
  }

  test("NTZ-micros fixture: TIMESTAMP_NTZ reinterprets as the same UTC " +
    "wall clock") {
    val dir = java.nio.file.Files.createTempDirectory("ts-ntz").toString
    writeFixture(dir, StructField("ts", TimestampNTZType),
      java.time.LocalDateTime.ofEpochSecond(epochSec, nanosOfSec.toInt,
        java.time.ZoneOffset.UTC))
    val got = Tables.events(spark, dir)
    got.schema("ts").dataType shouldBe TimestampType
    // parquet micros precision: the nanos tail was already floored to
    // micros by the writer; the session TZ is UTC, so reinterpretation
    // is an identity on the wall clock
    got.select(unix_micros(col("ts"))).head().getLong(0) shouldBe wantMicros
  }

  test("both encodings agree end-to-end (same rows after normalization)") {
    val d1 = java.nio.file.Files.createTempDirectory("ts-a").toString
    val d2 = java.nio.file.Files.createTempDirectory("ts-b").toString
    writeFixture(d1, StructField("ts", LongType),
      epochSec * 1000000000L + nanosOfSec)
    writeFixture(d2, StructField("ts", TimestampNTZType),
      java.time.LocalDateTime.ofEpochSecond(epochSec, nanosOfSec.toInt,
        java.time.ZoneOffset.UTC))
    val a = Tables.events(spark, d1).select("event_id", "ts", "event_type")
      .collect().toSeq
    val b = Tables.events(spark, d2).select("event_id", "ts", "event_type")
      .collect().toSeq
    a shouldBe b
  }
}
