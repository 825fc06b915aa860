package graft

import graft.etl.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SkewSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("saltedJoin ≡ plain join on a pathologically skewed key") {
    import spark.implicits._
    // 10k rows of one hot key + a tail, joined to a 3-row dim
    val fact = spark.range(10000)
      .select(when(col("id") < 9000, 1L).otherwise(col("id") % 3).as("k"),
        col("id").as("v"))
    val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).groupBy(col("k"), col("name"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)
      .groupBy(col("k"), col("name"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    salted shouldBe plain
  }

  test("left join keeps unmatched skewed-side rows exactly once") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (1L, "b"), (99L, "orphan")).toDF("k", "v")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val rows = Skew.saltedJoin(fact, dim, "k", salt = 4, joinType = "left")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    rows.length shouldBe 3
    rows.count(_._3.isEmpty) shouldBe 1 // orphan survives once, name NULL
  }
}
