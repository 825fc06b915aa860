package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.graft.SortedIntersectCount
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SortedIntersectCountSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("SQL surface: registered via GraftExtensions") {
    val r = spark.sql(
      "SELECT sorted_intersect_count(array(1L,2L,5L), array(2L,3L,5L,9L)) AS c")
      .collect().head.getInt(0)
    r shouldBe 2
  }

  test("null inputs propagate null") {
    val r = spark.sql(
      "SELECT sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS c")
      .collect().head
    r.isNullAt(0) shouldBe true
  }

  test("property: ≡ size(array_intersect) on sorted distinct arrays (codegen path)") {
    import spark.implicits._
    val arr = Gen.listOf(Gen.chooseNum(-20L, 20L)).map(_.distinct.sorted)
    val prop = Prop.forAllNoShrink(Gen.listOfN(30, Gen.zip(arr, arr))) { pairs =>
      val df = pairs.toDF("a", "b")
      val custom = GraftColumnBridge.column(SortedIntersectCount(
        GraftColumnBridge.expression(col("a")),
        GraftColumnBridge.expression(col("b"))))
      val rows = df.select(custom.as("c"),
        expr("size(array_intersect(a, b))").as("ref")).collect()
      rows.forall(r => r.getInt(0) == r.getInt(1))
    }
    PropCheck.check(prop, minSuccessful = 20, tag = "SortedIntersectCountSpec#1")
  }
}
