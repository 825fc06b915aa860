package graft

import graft.etl.{Layout, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scan-elimination portfolio, the partner of BucketingSpec's
  * shuffle-elimination: (1) static partition pruning — a literal predicate
  * on the partition column reads only its directories; (2) DYNAMIC
  * partition pruning — a join against a filtered dimension prunes the fact
  * scan at runtime from the dim side's broadcast result. At 100 TB these
  * are the difference between reading a week and reading three years. */
class LayoutSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val path = "/tmp/graft-test-layout/events_by_day"

  // day partitions read back as DateType (partition-column type inference)
  private def partitionedEvents() = {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d).withColumn("day", to_date(col("ts")))
    Layout.writePartitioned(ev, path, "day")
    spark.read.parquet(path)
  }

  test("static pruning: literal day predicate reaches the scan as a partition filter") {
    val part = partitionedEvents()
    part.select("day").distinct().count() should be > 2L
    val firstDay = part.select(min("day")).head().getDate(0)
    val q = part.filter(col("day") === lit(firstDay))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    q.queryExecution.toRdd.foreach(_ => ())
    val plan = q.queryExecution.executedPlan.toString
    // the day predicate must be a PartitionFilter (directory pruning), not
    // a post-scan Filter over all files
    plan should include("PartitionFilters")
    plan.linesIterator.find(_.contains("PartitionFilters")).get should
      include("day")
  }

  test("dynamic pruning: dim-side filter prunes the fact scan at runtime, result parity") {
    val part = partitionedEvents()
    import spark.implicits._
    // a "promo calendar" dimension where only 3 of 5 rows survive a
    // SELECTIVE dim-side filter — the fact-side narrowing can then only
    // come from DPP (the broadcast result re-used as a partition filter),
    // never from static pruning
    val allDays = part.select(col("day")).distinct()
      .orderBy(col("day")).limit(5).as[java.sql.Date].collect()
    val promoDays = allDays.take(3)
    // two DPP heuristics to satisfy: the dim must be a FILE relation (a
    // filter over a local relation is constant-folded away before the
    // PartitionPruning rule runs), and the surviving predicate must be
    // "likely selective" — an explicit comparison (EqualTo on a column),
    // not a bare boolean attribute
    val dimPath = "/tmp/graft-test-layout/promo_dim"
    allDays.toSeq.toDF("day")
      .withColumn("tier", when(col("day").isin(promoDays.toSeq: _*), "promo")
        .otherwise("normal"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tier") === "promo")

    val q = part.join(dim, Seq("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    q.queryExecution.toRdd.foreach(_ => ())
    val plan = q.queryExecution.executedPlan.toString
    plan should include("dynamicpruning")

    // parity: same counts as the unpartitioned formulation
    val d = "/root/testdata/sf0.001"
    val expected = Tables.events(spark, d)
      .withColumn("day", to_date(col("ts")))
      .filter(col("day").isin(promoDays.toSeq: _*))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    q.collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet shouldBe
      expected
  }
}
