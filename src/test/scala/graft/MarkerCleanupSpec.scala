package graft

import graft.etl.{InfluxSink, MarkerCleanup}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.collection.mutable.ArrayBuffer

/** The legacy-marker cleanup tool (the `ha_type` upgrade caveat's
  * restore path): marker-less STATISTICS series are inventoried by the
  * mean/sum field signature, then — per series — fetched, DELETED, and
  * rewritten with the marker, in exactly that order (the v2 delete API's
  * tag-equality predicate would match the marked copies, so writing
  * first would let the delete wipe them). States-shaped points sharing
  * the same tag family must never be touched. */
class MarkerCleanupSpec extends AnyFunSuite with Matchers {

  private val cfg =
    InfluxSink.Config("http://localhost:9", "o", "bkt", "tok")

  // two legacy statistics series (mean-typed C/temp at two timestamps;
  // sum-typed kWh/energy at one) plus a STATES point family (numeric
  // `value` + string `state`) that must survive untouched
  private val fixtureCsv =
    """#datatype,string,long,dateTime:RFC3339,string,string,string,string,string,string
      |#group,false,false,false,false,true,true,true,true,true
      |#default,_result,,,,,,,,
      |,result,table,_time,_value,_field,_measurement,domain,entity_id,source
      |,_result,0,2024-01-01T00:00:00Z,10.5,mean,C,sensor,temp,HA
      |,_result,0,2024-01-01T00:00:00Z,10.0,min,C,sensor,temp,HA
      |,_result,0,2024-01-01T00:00:00Z,11.0,max,C,sensor,temp,HA
      |,_result,0,2024-01-01T01:00:00Z,12.5,mean,C,sensor,temp,HA
      |,_result,0,2024-01-01T01:00:00Z,12.0,min,C,sensor,temp,HA
      |,_result,0,2024-01-01T01:00:00Z,13.0,max,C,sensor,temp,HA
      |,_result,1,2024-01-01T00:00:00Z,250.25,sum,kWh,sensor,energy,HA
      |,_result,1,2024-01-01T00:00:00Z,1250.25,state,kWh,sensor,energy,HA
      |,_result,2,2024-01-01T00:00:00Z,21.0,value,C,sensor,temp2,HA
      |,_result,3,2024-01-01T00:00:00Z,on,state,C,sensor,temp2,HA
      |""".stripMargin

  private final class FakeHttp extends MarkerCleanup.Http {
    val ops = new ArrayBuffer[(String, Any)]()
    override def query(flux: String): String = {
      ops += (("query", flux)); fixtureCsv
    }
    override def delete(startIso: String, stopIso: String,
                        predicate: String): Unit =
      ops += (("delete", (startIso, stopIso, predicate)))
    override def write(lines: Seq[String]): Unit =
      ops += (("write", lines))
  }

  test("dry-run inventories the statistics-shaped series only and " +
    "touches nothing") {
    val http = new FakeHttp
    val report = MarkerCleanup.run(cfg, http, dryRun = true)
    http.ops.map(_._1) shouldBe Seq("query")
    http.ops.head._2.asInstanceOf[String] should
      include("""not exists r["ha_type"]""")
    report.dryRun shouldBe true
    report.rewritten shouldBe 0L
    report.series.map(_.key.measurement) shouldBe Seq("C", "kWh")
    val c = report.series.head
    c.key.tags shouldBe Map("domain" -> "sensor", "entity_id" -> "temp",
      "source" -> "HA")
    c.nPoints shouldBe 2L
    c.fieldSets shouldBe Set(Set("mean", "min", "max"))
    c.predicate shouldBe
      """_measurement="C" AND domain="sensor" AND entity_id="temp" AND source="HA""""
    // the states family (numeric value + STRING state) is not statistics
    report.series.map(_.key.tags("entity_id")) should not contain "temp2"
  }

  test("apply rewrites each series with the marker added, DELETE before " +
    "WRITE per series, delete stop one ms past the last legacy point") {
    val http = new FakeHttp
    val report = MarkerCleanup.run(cfg, http, dryRun = false)
    report.rewritten shouldBe 3L
    http.ops.map(_._1) shouldBe
      Seq("query", "delete", "write", "delete", "write")
    val (d1s, d1e, d1p) =
      http.ops(1)._2.asInstanceOf[(String, String, String)]
    (d1s, d1e) shouldBe
      (("2024-01-01T00:00:00Z", "2024-01-01T01:00:00.001Z"))
    d1p should include("""entity_id="temp"""")
    http.ops(2)._2.asInstanceOf[Seq[String]] shouldBe Seq(
      "C,domain=sensor,entity_id=temp,ha_type=statistics,source=HA " +
        "max=11.0,mean=10.5,min=10.0 1704067200000000000",
      "C,domain=sensor,entity_id=temp,ha_type=statistics,source=HA " +
        "max=13.0,mean=12.5,min=12.0 1704070800000000000")
    http.ops(4)._2.asInstanceOf[Seq[String]] shouldBe Seq(
      "kWh,domain=sensor,entity_id=energy,ha_type=statistics,source=HA " +
        "state=1250.25,sum=250.25 1704067200000000000")
    // the rewritten series now match BOTH watermark invariants: the
    // statistics query's required marker and the states query's exclusion
    all(http.ops(2)._2.asInstanceOf[Seq[String]]) should
      include("ha_type=statistics")
  }
}
