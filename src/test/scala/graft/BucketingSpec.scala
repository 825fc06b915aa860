package graft

import graft.etl.{Bucketing, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Co-located join: bucketed tables joined on the bucket key must plan NO
  * shuffle exchange on either side (the 100 TB fact⋈fact shape). */
class BucketingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.isolated() // mutates session confs — see TestSpark.isolated

  test("bucketed fact⋈fact join is exchange-free and correct") {
    val d = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.orders(spark, d), "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(Tables.lineitem(spark, d), "lineitem_b", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = Bucketing.table(spark, "lineitem_b")
        .join(Bucketing.table(spark, "orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_custkey", "l_quantity")
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"
      // and the result matches the plain (shuffled) join
      val expected = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .count()
      joined.count() shouldBe expected
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
