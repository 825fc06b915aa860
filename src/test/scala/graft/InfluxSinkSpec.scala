package graft

import graft.etl.InfluxSink
import graft.model.InfluxPoint
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class InfluxSinkSpec extends AnyFunSuite with Matchers {

  private val p = InfluxPoint(
    measurement = "°C",
    tags = Map("source" -> "HA", "entity_id" -> "temp kitchen", "domain" -> "sensor"),
    fields_num = Map("value" -> 21.5, "battery" -> 90.0),
    fields_str = Map("state" -> """quoted "x" \path"""),
    time_ms = 1704067200123L)

  test("toLine: escaping, sorted tags/fields, ns timestamp") {
    val line = InfluxSink.toLine(p)
    line shouldBe
      """°C,domain=sensor,entity_id=temp\ kitchen,source=HA battery=90.0,value=21.5,state="quoted \"x\" \\path" 1704067200123000000"""
  }

  test("toLine: measurement with comma and space escaped") {
    val line = InfluxSink.toLine(p.copy(measurement = "a b,c"))
    line should startWith("""a\ b\,c,""")
  }

  test("statisticsPoints → toLine: the end-to-end statistics migration — " +
    "sensor-type field triples, unit-measurement posture, no NULL-valued " +
    "field keys ever reach the line protocol") {
    val spark = TestSpark.spark
    import spark.implicits._
    val stats = Seq(
      (1, 1704067200000L, 20.0, 19.0, 21.0, 20.5, 3.0), // mean-type
      (2, 1704067200000L, 5.0, 4.0, 6.0, 5.5, 7.0),     // sum-type
      (3, 1704067200000L, 1.0, 1.0, 1.0, 1.0, 1.0),     // NEITHER-typed
      (4, 1704067200000L, 2.0, 1.5, 2.5, 2.2, 9.0)      // ''-unit sum-type
    ).toDF("metadata_id", "start_ts_ms", "mean", "min", "max", "state", "sum")
    val meta = Seq(
      (1, "sensor.temp_attic", "C", true, false),
      (2, "sensor.energy_main", null.asInstanceOf[String], false, true),
      (3, "sensor.broken_x", "W", false, false),
      (4, "sensor.pulse_cnt", "", false, true)
    ).toDF("metadata_id", "statistic_id", "unit_of_measurement", "has_mean",
      "has_sum")
    val lines = InfluxSink.asPoints(
        graft.etl.Transform.statisticsPoints(stats, meta))
      .collect().map(InfluxSink.toLine).sorted
    // sensor 3 (has_mean=has_sum=false) publishes NOTHING — an empty
    // field set is invalid line protocol, so the row is dropped
    lines shouldBe Array(
      "C,domain=sensor,entity_id=temp_attic,ha_type=statistics,source=HA " +
        "max=21.0,mean=20.0,min=19.0 1704067200000000000",
      // EMPTY-string unit → the F4 "count" remap; sum-type publishes
      // ONLY state/sum
      "count,domain=sensor,entity_id=pulse_cnt,ha_type=statistics," +
        "source=HA state=2.2,sum=9.0 1704067200000000000",
      // ABSENT unit → 'default_measurement' FIRST (F4's order — the same
      // measurement the states half gives a unit-less sensor)
      "default_measurement,domain=sensor,entity_id=energy_main," +
        "ha_type=statistics,source=HA state=5.5,sum=7.0 1704067200000000000")
  }

  test("statisticsPoints: a meta table WITHOUT has_sum (older recorder " +
    "schema) falls back to NOT has_mean for the sum side") {
    val spark = TestSpark.spark
    import spark.implicits._
    val stats = Seq((2, 1704067200000L, 5.0, 4.0, 6.0, 5.5, 7.0))
      .toDF("metadata_id", "start_ts_ms", "mean", "min", "max", "state", "sum")
    val meta = Seq((2, "sensor.energy_main", "kWh", false))
      .toDF("metadata_id", "statistic_id", "unit_of_measurement", "has_mean")
    val lines = InfluxSink.asPoints(
        graft.etl.Transform.statisticsPoints(stats, meta))
      .collect().map(InfluxSink.toLine)
    lines shouldBe Array(
      "kWh,domain=sensor,entity_id=energy_main,ha_type=statistics," +
        "source=HA state=5.5,sum=7.0 1704067200000000000")
  }

  test("write: partition-parallel batching honors batchSize") {
    val spark = TestSpark.spark
    import spark.implicits._
    val points = (1 to 25).map(i =>
      InfluxPoint("m", Map("t" -> "v"), Map("value" -> i.toDouble), Map(), i.toLong))
    val ds = spark.createDataset(points).repartition(2)
    val cfg = InfluxSink.Config("http://x", "o", "b", "tok", batchSize = 10)
    ds.sparkSession.sparkContext.setJobDescription("sink-test")
    InfluxSink.write(ds, cfg, _ => RecordingWriter)
    val batches = RecordingWriter.drain()
    batches.map(_.size).sum shouldBe 25
    all(batches.map(_.size)) should be <= 10
    // 2 partitions, each grouped by 10 ⇒ at least 3 batches, none empty
    batches.size should be >= 3
    batches.foreach(_ should not be empty)
  }

  test("write: pointByPoint debug mode sends 1-line batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      InfluxPoint("m", Map(), Map("value" -> 1.0), Map(), 1L),
      InfluxPoint("m", Map(), Map("value" -> 2.0), Map(), 2L))).coalesce(1)
    val cfg = InfluxSink.Config("http://x", "o", "b", "tok", pointByPoint = true)
    InfluxSink.write(ds, cfg, _ => RecordingWriter)
    val batches = RecordingWriter.drain()
    batches.size shouldBe 2
    all(batches.map(_.size)) shouldBe 1
  }

  test("configFromEnv: fail-fast on missing/invalid values (Q8)") {
    val good = Map("INFLUXDB_URL" -> "http://i:8086", "INFLUXDB_ORG" -> "o",
      "INFLUXDB_BUCKET" -> "b", "INFLUXDB_TOKEN" -> "t", "BATCH_SIZE" -> "500",
      "DEBUG_MODE" -> "true")
    val cfg = InfluxSink.configFromEnv(good)
    cfg.batchSize shouldBe 500
    cfg.pointByPoint shouldBe true
    an[IllegalArgumentException] should be thrownBy
      InfluxSink.configFromEnv(good - "INFLUXDB_TOKEN")
    an[IllegalArgumentException] should be thrownBy
      InfluxSink.configFromEnv(good + ("BATCH_SIZE" -> "0"))
    an[IllegalArgumentException] should be thrownBy
      InfluxSink.configFromEnv(good + ("INFLUXDB_URL" -> "ftp://x"))
  }
}

/** Collects batches across executor threads (local mode shares the JVM). */
object RecordingWriter extends InfluxSink.LineWriter {
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
  override def writeBatch(lines: Seq[String]): Unit = buf.add(lines)
  def drain(): List[Seq[String]] = {
    var out = List.empty[Seq[String]]
    var b = buf.poll()
    while (b != null) { out = b :: out; b = buf.poll() }
    out
  }
}
