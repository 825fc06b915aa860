package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ZOrderKeySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def zkey(xs: Int*): java.lang.Long =
    spark.sql(s"SELECT zorder_key(array(${xs.mkString(",")}))")
      .collect().head.get(0).asInstanceOf[java.lang.Long]

  test("bit interleave: dimension c's bit b lands at output bit b*n+c") {
    zkey(1, 0) shouldBe 1L // x bit0 → out bit0
    zkey(0, 1) shouldBe 2L // y bit0 → out bit1
    // x=3 → bits {0,1} → out {0,2}; y=5 → bits {0,2} → out {1,5}
    zkey(3, 5) shouldBe ((1L << 0) + (1L << 2) + (1L << 1) + (1L << 5))
  }

  test("single dimension is the identity on non-negative ints") {
    zkey(0) shouldBe 0L
    zkey(123456789) shouldBe 123456789L
  }

  test("null coordinate nulls the key") {
    spark.sql("SELECT zorder_key(array(1, CAST(NULL AS INT)))")
      .collect().head.isNullAt(0) shouldBe true
  }

  test("bijective on a bounded grid: 32x32 cells give 1024 distinct keys") {
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x, y)))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        expr("zorder_key(array(x, y))").as("zkey"))
    grid.select("zkey").distinct().count() shouldBe 1024L
  }

  test("fuzz: zorder_key over random dimensionality/values matches a " +
    "direct reference interleave, negatives and large values included") {
    import org.scalacheck.{Gen, Prop}
    def referenceKey(xs: Seq[Int]): Long = {
      val n = xs.length
      val bits = 62 / n
      var key = 0L
      for (c <- 0 until n; b <- 0 until bits)
        key |= ((xs(c).toLong >> b) & 1L) << (b * n + c)
      key
    }
    val genVec = Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.chooseNum(-100, 100),
        Gen.chooseNum(Int.MinValue, Int.MaxValue))))
    val prop = Prop.forAllNoShrink(genVec) { xs =>
      zkey(xs: _*) == referenceKey(xs)
    }
    PropCheck.check(prop, minSuccessful = 60, tag = "ZOrderKeySpec#1")
  }

  test("data-skipping property: z-range partitions bound BOTH dims, " +
    "1-D sort leaves the other dim unbounded") {
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x, y)))
      .toDF("x", "y")
      .select(col("x"), col("y"), expr("zorder_key(array(x, y))").as("zkey"))
    def maxXExtent(df: org.apache.spark.sql.DataFrame): Int =
      df.select(col("x"), spark_partition_id().as("p"))
        .groupBy("p").agg((max("x") - min("x")).as("ext"))
        .agg(max("ext")).as[Int].head()
    // a file written per range-partition keeps x min/max stats this narrow:
    val zLayout = maxXExtent(grid.repartitionByRange(8, col("zkey")))
    val yLayout = maxXExtent(grid.repartitionByRange(8, col("y")))
    zLayout should be <= 16 // each z range spans at most half the x axis
    yLayout shouldBe 31 // y-sorted files see the FULL x range → no pruning
  }
}
