package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.etl.InfluxSink
import graft.model.{StateAttributesRow, StateRow, StatesMetaRow}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** End-to-end composition of the reference program (watermark → export →
  * transform → load) against a mock InfluxDB that serves BOTH endpoints:
  * /api/v2/query (watermark) and /api/v2/write (sink). */
class BackfillSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // oldest point in the sink: 2023-01-01T00:00:10Z
  private val watermarkCsv =
    """,result,table,_time,_value
      |,_result,0,2023-01-01T00:00:10Z,1.0
      |""".stripMargin

  test("full pipeline: only rows older than the sink watermark are loaded") {
    val writes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v2/query", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val b = watermarkCsv.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      }
    })
    server.createContext("/api/v2/write", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        writes.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        ex.sendResponseHeaders(204, -1); ex.close()
      }
    })
    server.start()
    try {
      val cfg = InfluxSink.Config(
        s"http://127.0.0.1:${server.getAddress.getPort}", "o", "b", "t")
      val watermark = graft.sources.InfluxWatermarkSource.oldestTimestamp(cfg)
        .map(_.toEpochMilli)
      watermark shouldBe Some(1672531210000L)

      // 1672531200.0 = 2023-01-01T00:00:00Z (older → exported);
      // 1672531220.0 = :20 (younger than the :10 watermark → excluded)
      val states = Seq(
        StateRow(1, Some(10), "21.5", 1672531200.0),
        StateRow(1, Some(10), "22.5", 1672531220.0)).toDF()
      val meta = Seq(StatesMetaRow(1, "sensor.kitchen")).toDF()
      val attrs = Seq(StateAttributesRow(10,
        """{"unit_of_measurement":"C","friendly_name":"K"}""")).toDF()

      val points = Backfill.plan(states, meta, attrs, watermark)
      InfluxSink.write(InfluxSink.asPoints(points), cfg)

      val lines = writes.toArray(Array.empty[String]).flatMap(_.split("\n"))
      lines.length shouldBe 1
      lines.head should startWith("C,")                 // measurement = unit
      lines.head should include("value=21.5")           // numeric state path
      lines.head should include("friendly_name=K")
      lines.head should endWith("1672531200000000000")  // ns timestamp
    } finally server.stop(0)
  }

  test("statistics backfill: only rows older than the sink watermark " +
    "load, through the full mock-server round trip") {
    val writes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v2/query", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val b = watermarkCsv.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      }
    })
    server.createContext("/api/v2/write", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        writes.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        ex.sendResponseHeaders(204, -1); ex.close()
      }
    })
    server.start()
    try {
      val cfg = InfluxSink.Config(
        s"http://127.0.0.1:${server.getAddress.getPort}", "o", "b", "t")
      val watermark = graft.sources.InfluxWatermarkSource.oldestTimestamp(cfg)
        .map(_.toEpochMilli)
      // :00 hour row older than the :10 watermark → exported; :20 excluded
      val stats = Seq(
        (1, 1672531200000L, 20.0, 19.0, 21.0, 20.5, 3.0),
        (1, 1672531220000L, 30.0, 29.0, 31.0, 30.5, 4.0)
      ).toDF("metadata_id", "start_ts_ms", "mean", "min", "max", "state", "sum")
      val meta = Seq((1, "sensor.temp_attic", "C", true))
        .toDF("metadata_id", "statistic_id", "unit_of_measurement", "has_mean")
      val points = Backfill.statisticsPlan(stats, meta, watermark)
      InfluxSink.write(InfluxSink.asPoints(points), cfg)
      val lines = writes.toArray(Array.empty[String]).flatMap(_.split("\n"))
      lines.length shouldBe 1
      lines.head should startWith("C,")                 // measurement = unit
      lines.head should include("entity_id=temp_attic")
      lines.head should include("mean=20.0")            // mean-type triple
      lines.head should not include "sum="
      lines.head should endWith("1672531200000000000")  // ns timestamp
    } finally server.stop(0)
  }

  test("missing watermark exports everything (empty-bucket / Q1 path)") {
    val states = Seq(
      StateRow(1, Some(10), "1", 1672531200.0),
      StateRow(1, Some(10), "2", 1672531220.0),
      StateRow(1, Some(10), "unknown", 1672531230.0)).toDF()
    val meta = Seq(StatesMetaRow(1, "sensor.kitchen")).toDF()
    val attrs = Seq(StateAttributesRow(10, "{}")).toDF()
    Backfill.plan(states, meta, attrs, None).count() shouldBe 2 // junk dropped
  }
}
