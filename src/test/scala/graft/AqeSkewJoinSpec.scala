package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** AQE skew-join splitting — the RUNTIME half of the skew story
  * ([[graft.etl.Skew]] salting is the explicit half for pathological
  * single-key skew). A shuffle join whose map stats reveal one oversized
  * partition gets that partition split across several reducer tasks (the
  * other side's matching partition is replicated to each), so one chatty
  * sensor / one mega-domain can't pin a 1000-executor stage on a single
  * straggler. This spec drives the thresholds down so the optimization
  * actually fires at fixture scale and asserts both the plan marker and
  * result parity — proving our defaults don't block the re-plan. */
class AqeSkewJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.isolated() // mutates session confs — see TestSpark.isolated

  test("skewed SMJ partition is split at runtime (skew=true) with identical results") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    // force a shuffle join (no broadcast escape hatch), and lower the skew
    // bar so a ~MB hot partition counts as skewed
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // one hot key owns ~90% of the fact side, with a payload wide enough
      // that its shuffle partition dwarfs the 64KB threshold
      val fact = spark.range(60000)
        .select(when(col("id") < 54000, 7L).otherwise(col("id") % 40).as("k"),
          concat(lit("payload_"), lpad(col("id").cast("string"), 24, "0")).as("v"))
      val dim = spark.range(40).select(col("id").as("k"),
        concat(lit("dim_"), col("id").cast("string")).as("name"))

      val joined = fact.join(dim, Seq("k"))
      joined.queryExecution.toRdd.foreach(_ => ())
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("skew=true")

      // parity: per-key counts identical to the logical answer
      val counts = joined.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      counts(7L) shouldBe 54000L + 150L // 54000 hot + ids ≡ 7 (mod 40) in the tail
      counts.values.sum shouldBe 60000L
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
