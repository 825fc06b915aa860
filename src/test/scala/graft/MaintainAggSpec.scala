package graft

import graft.ext.Snapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MaintainAggSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (event_id, hour-offset, event_type, value) → events-shaped frame
  private def mk(rows: (Long, Int, String, java.lang.Double)*): DataFrame =
    rows.toSeq
      .map { case (id, h, t, v) =>
        (id, new java.sql.Timestamp(1704067200000L + h * 3600000L), 7L, t, v,
          "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def freshAgg(df: DataFrame): Map[(String, Long), (Long, Double, Any)] =
    df.groupBy(col("event_type"),
        unix_millis(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(25, 10)))
          .cast("double").as("s"), min(col("value")).as("m"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.get(4)))).toMap

  private def maintained(base: DataFrame, ins: DataFrame,
                         del: DataFrame): Map[(String, Long), (Long, Double, Any)] =
    Snapshot.maintainHourlyAgg(base, ins, del).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.get(4)))).toMap

  test("maintained state == fresh recompute across the adversarial min " +
    "cases: unique min deleted, one-of-two-equal mins deleted, non-min " +
    "deleted, group emptied, insert-only new group") {
    val base = mk(
      (1L, 0, "a", 1.0), (2L, 0, "a", 2.0), (3L, 0, "a", 3.0), // unique min
      (4L, 1, "b", 5.0), (5L, 1, "b", 5.0), (6L, 1, "b", 9.0), // dup min
      (7L, 2, "c", 4.0), (8L, 2, "c", 6.0), //  non-min delete
      (9L, 3, "d", 8.0)) // will be emptied
    val del = mk((1L, 0, "a", 1.0), (4L, 1, "b", 5.0), (8L, 2, "c", 6.0),
      (9L, 3, "d", 8.0))
    val ins = mk((100L, 5, "e", 2.5), (101L, 0, "a", 0.5))
    val survivors = base.join(del.select("event_id"), Seq("event_id"),
      "left_anti").unionByName(ins)
    val got = maintained(base, ins, del)
    got shouldBe freshAgg(survivors)
    // spot-check the semantics the cases encode
    got(("a", 1704067200000L))._3 shouldBe 0.5 // deleted unique min 1.0; inserted 0.5 wins over 2.0
    got(("b", 1704070800000L))._3 shouldBe 5.0 // one of two equal mins deleted → min survives
    got(("c", 1704074400000L))._3 shouldBe 4.0 // non-min deleted → untouched
    got.get(("d", 1704078000000L)) shouldBe None // emptied group drops
    got(("e", 1704085200000L)) shouldBe ((1L, 2.5, 2.5)) // insert-only group
  }

  test("maintained == fresh on the events fixture with the registered " +
    "changelog derivation") {
    val all = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val inserts = all.filter(col("event_id") % 13 === 0)
    val base = all.filter(col("event_id") % 13 =!= 0)
    val deletes = base.filter(col("event_id") % 7 === 0)
    val survivors = base.join(deletes.select("event_id"), Seq("event_id"),
      "left_anti").unionByName(inserts)
    maintained(base, inserts, deletes) shouldBe freshAgg(survivors)
  }

  test("maintenance COMPOSES: folding the changelog in two chunks through " +
    "maintainAggState lands on the one-shot result exactly (the streaming " +
    "twin's algebra)") {
    val all = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val inserts = all.filter(col("event_id") % 13 === 0)
    val base = all.filter(col("event_id") % 13 =!= 0)
    val deletes = base.filter(col("event_id") % 7 === 0)
    // chunk the changelog by event-id parity
    val ins1 = inserts.filter(col("event_id") % 2 === 0)
    val ins2 = inserts.filter(col("event_id") % 2 =!= 0)
    val del1 = deletes.filter(col("event_id") % 2 === 0)
    val del2 = deletes.filter(col("event_id") % 2 =!= 0)
    def surv(b: DataFrame, d: DataFrame, i: DataFrame): DataFrame =
      Snapshot.prepHourly(b).join(d.select("event_id"), Seq("event_id"),
        "left_anti").unionByName(Snapshot.prepHourly(i))
    val s1 = Snapshot.maintainAggState(Snapshot.hourlyAggState(base),
      surv(base, del1, ins1), ins1, del1)
    val base2 = base.join(del1.select("event_id"), Seq("event_id"),
      "left_anti").unionByName(ins1)
    val s2 = Snapshot.maintainAggState(s1, surv(base2, del2, ins2),
      ins2, del2)
    val folded = Snapshot.renderHourlyAgg(s2).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.get(4)))).toMap
    folded shouldBe maintained(base, inserts, deletes)
  }

  test("min rescan is RESTRICTED: the plan prunes the re-aggregation to " +
    "dirty groups through a semi-join, and survivors form via anti-join") {
    val all = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val inserts = all.filter(col("event_id") % 13 === 0)
    val base = all.filter(col("event_id") % 13 =!= 0)
    val deletes = base.filter(col("event_id") % 7 === 0)
    val plan = Snapshot.maintainHourlyAgg(base, inserts, deletes)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }
}
