package graft

import graft.etl.Tpch
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SemiAntiJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val orders = Seq(
    (1L, 100L, "1-URGENT", 10.0),
    (2L, 100L, "1-URGENT", 20.0),
    (3L, 200L, "2-HIGH", 30.0)
  ).toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")

  private val lineitem = Seq(
    (1L, "R"), (1L, "N"), // order 1: returned line → counted once (semi, not inner)
    (2L, "N"),            // order 2: no returns
    (3L, "R")
  ).toDF("l_orderkey", "l_returnflag")

  private val customer = Seq(
    (100L, "AUTOMOBILE", 10.0),
    (200L, "AUTOMOBILE", 20.0),
    (300L, "BUILDING", 30.0) // no orders
  ).toDF("c_custkey", "c_mktsegment", "c_acctbal")

  test("semi join counts each qualifying order once, skips no-return orders") {
    val out = Tpch.orderPriorityWithReturns(orders, lineitem)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("1-URGENT" -> 1L, "2-HIGH" -> 1L)
  }

  test("anti join keeps only customers with zero urgent orders") {
    // cust 100 has urgent orders → dropped; 200 (high only) and 300 (none) stay
    val out = Tpch.customersWithoutOrders(customer, orders)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_customers"), r.getAs[Double]("avg_acctbal"))).toMap
    out shouldBe Map("AUTOMOBILE" -> (1L, 20.0), "BUILDING" -> (1L, 30.0))
  }
}
