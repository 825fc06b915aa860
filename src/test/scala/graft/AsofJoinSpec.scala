package graft

import graft.ext.EventsExt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class AsofJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("asofJoin picks the most recent right row at or before each left time") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 50L), (4L, 20L, 100L))
      .toDF("id", "k", "t")
    val right = Seq((10L, 90L, "a"), (10L, 100L, "b"), (10L, 200L, "c"),
      (20L, 150L, "z")).toDF("k", "t", "v")
    val out = EventsExt.asofJoin(left, right, "k", "t")
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    out(1L) shouldBe Some("b") // equal timestamp matches (>=)
    out(2L) shouldBe Some("c") // latest of the three
    out(3L) shouldBe None      // nothing at or before t=50
    out(4L) shouldBe None      // right row for k=20 is later
  }

  test("asofJoin ≡ brute-force per-row subquery on fixture data") {
    val ev = graft.etl.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("value").as("v"))
    val fast = EventsExt.asofJoin(p, c, "user_id", "us")
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // brute force: join all qualifying pairs, keep max-us click per purchase
    val brute = p.as("p").join(c.as("c"),
        col("p.user_id") === col("c.user_id") && col("p.us") >= col("c.us"), "left")
      .groupBy(col("p.event_id"))
      .agg(max_by(col("c.v"), col("c.us")).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    fast.size shouldBe brute.size
    fast shouldBe brute
  }
}
