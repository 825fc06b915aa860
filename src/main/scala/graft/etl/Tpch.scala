package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Star-schema analytics over the TPC-H-ish fixtures — the rebuild's
  * demonstration that the relational core (S5/J1/J2/A-row) holds on a
  * classic warehouse shape, with the physical plan a 1000-executor cluster
  * wants:
  *
  *  - dimensions (region/nation/customer/supplier) are broadcast — the
  *    lineitem fact table streams through map-side joins and shuffles only
  *    for the fact⋈fact orders join and the final partial+final aggregate;
  *  - date predicates sit directly on scan columns (parquet pushdown);
  *  - top-k uses sort+limit → TakeOrderedAndProject, never a global sort;
  *  - money sums go through DECIMAL for association-order-free exactness,
  *    cast back to double at the end (bit-equal to the DuckDB oracle).
  */
object Tpch {

  private def disc(price: String, discount: String) =
    (col(price) * (lit(1) - col(discount))).cast(DecimalType(18, 4))

  /** Q1-style pricing summary with a pushed-down ship-date predicate. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-06-30")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
          .as("sum_base_price"),
        sum(disc("l_extendedprice", "l_discount")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** Q3-style shipping priority: top-10 open orders by revenue for one
    * market segment. orders⋈lineitem is the one real shuffle; the top-10 is
    * TakeOrderedAndProject (no global sort); the customer join side is left
    * unhinted so AQE picks broadcast vs shuffle from runtime stats. */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") > to_timestamp(lit("1999-01-01")))
      .join(orders.filter(col("o_orderdate") < to_timestamp(lit("1999-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      // no broadcast hint: customer is fact-scale in real TPC-H — AQE
      // broadcasts it at small SF from runtime stats, shuffles it at 100×
      .join(customer.filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        // o_orderdate reads as TIMESTAMP_NTZ; session is pinned UTC so the
        // LTZ cast is lossless and unix_millis applies
        unix_millis(col("o_orderdate").cast("timestamp_ltz")).as("o_orderdate_ms"),
        col("o_orderpriority"))
      .agg(sum(disc("l_extendedprice", "l_discount")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  /** Q5-style local-supplier volume for one region: the whole dimension
    * chain (region→nation→customer, supplier) broadcasts; lineitem joins
    * orders on the shuffle, everything else map-side. */
  def localSupplierVolume(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val asiaNations = nation
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    lineitem
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      // cust is customer-scale (a fact table in real TPC-H): hint only the
      // genuinely bounded dims (region/nation/supplier), let AQE size this
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(disc("l_extendedprice", "l_discount")).cast("double").as("revenue"))
  }

  /** Global top-k by price → TakeOrderedAndProject (O(n log k)/partition,
    * k rows to the driver — no range-partitioned sort). */
  def topOrders(orders: DataFrame, k: Int): DataFrame =
    orders.select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** Brand rollup over part (exercises the last unused fixture). */
  def partsByBrand(part: DataFrame): DataFrame =
    part.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        (sum(col("p_retailprice").cast(DecimalType(18, 2))).cast("double") /
          count(lit(1))).as("avg_price"))

  /** TPC-H Q4 shape: order counts per priority for orders with at least one
    * returned line — EXISTS as a LEFT SEMI join. The semi join shuffles only
    * (orderkey) pairs and short-circuits on first match, never multiplying
    * orders by their lineitem count the way an inner-join+distinct would. */
  def orderPriorityWithReturns(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(
        lineitem.filter(col("l_returnflag") === "R").select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  /** Customers with no URGENT orders — NOT EXISTS as a LEFT ANTI join,
    * aggregated per market segment (the anti join, like the semi, carries
    * only the join keys through the shuffle; the priority filter makes the
    * result non-empty at every fixture scale, since each customer has some
    * order but not necessarily an urgent one). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
        orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double") /
          count(lit(1))).as("avg_acctbal"))

  /** Q6 forecast-revenue: every predicate sits on a scan column (parquet
    * pushdown prunes row groups by shipdate/discount/quantity stats), the
    * answer is ONE partial-aggregated DECIMAL sum — zero joins, the
    * cheapest possible shape at 100 TB. */
  def forecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
        col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))

  /** Q7 volume-shipping between two trading nations: the two nation dims
    * broadcast PRE-FILTERED to the pair, so only their suppliers/customers
    * survive the map-side joins; the one real shuffle is lineitem⋈orders.
    * Year comes from `year()` over the UTC-pinned timestamp — identical
    * in DuckDB. */
  def volumeShipping(supplier: DataFrame, lineitem: DataFrame,
                     orders: DataFrame, customer: DataFrame,
                     nation: DataFrame): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      // customer is fact-scale in real TPC-H: unhinted, AQE decides
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(disc("l_extendedprice", "l_discount")).cast("double").as("revenue"))
  }

  /** Q8 national market share: one nation's suppliers' slice of the PROMO
    * volume sold into one region's market, per order year. The share is a
    * ratio of two DECIMAL-exact sums with ONE terminal division — no
    * IEEE accumulation anywhere. */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
                  orders: DataFrame, lineitem: DataFrame, part: DataFrame,
                  supplier: DataFrame): DataFrame = {
    val marketNations = nation
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("mkt_nk"))
    val suppNation = nation
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val vol = disc("l_extendedprice", "l_discount")
    lineitem
      .join(broadcast(part.filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .join(orders.filter(
          col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(marketNations), col("c_nationkey") === col("mkt_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_2", vol)
          .otherwise(lit(0).cast(DecimalType(18, 4)))).cast("double") /
        sum(vol).cast("double")).as("mkt_share"))
  }

  /** Q10 returned-items report: revenue lost to returns per customer in
    * one quarter, top-k by revenue (TakeOrderedAndProject — k rows to the
    * driver, never a global sort of the customer aggregate). */
  def returnedItems(customer: DataFrame, orders: DataFrame,
                    lineitem: DataFrame, nation: DataFrame,
                    k: Int = 20): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders.filter(
          col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1997-04-01")))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name"),
        col("c_acctbal"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(disc("l_extendedprice", "l_discount")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)

  /** Q14 promo-revenue share for one month: part broadcasts key+type only,
    * the share is 100·(DECIMAL sum)/(DECIMAL sum) — two fixed IEEE ops in
    * the same order on both engines. */
  def promoRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val vol = disc("l_extendedprice", "l_discount")
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-10-01")))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit(0).cast(DecimalType(18, 4)))).cast("double") /
        sum(vol).cast("double")).as("promo_revenue"))
  }

  /** Q17 shape — small-quantity-order revenue: the correlated scalar
    * subquery `l_quantity < 0.2 * avg(l_quantity) WHERE same part`
    * DECORRELATED by hand into a per-part aggregate joined back (exactly
    * the rewrite Catalyst's decorrelation performs): one partial-aggregated
    * shuffle builds the |parts|-row threshold table, the fact re-joins it
    * on the part key (AQE sizes the side), and the answer is one DECIMAL
    * sum with a single terminal division. The threshold itself is
    * DECIMAL-sum/count → double → ×0.2 — two fixed IEEE ops in the same
    * order on both engines, so the boundary predicate is deterministic. */
  def smallQuantityRevenue(lineitem: DataFrame): DataFrame = {
    val thresholds = lineitem.groupBy(col("l_partkey"))
      .agg(((sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double") /
        count(lit(1)).cast("double")) * 0.2).as("qty_threshold"))
    lineitem.join(thresholds, Seq("l_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2)))
        .cast("double") / 7.0).as("avg_yearly"))
  }

  /** Q18 shape — large-volume orders: HAVING over a fact aggregate
    * (sum(l_quantity) > minQty, DECIMAL-exact so the cut is deterministic)
    * joined back to orders/customer, top-k via TakeOrderedAndProject. The
    * heavy side of the join is the already-aggregated |orders|-row table,
    * not lineitem. */
  def largeVolumeOrders(customer: DataFrame, orders: DataFrame,
                        lineitem: DataFrame, minQty: Int = 150,
                        k: Int = 20): DataFrame = {
    val big = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("tq"))
      .filter(col("tq") > minQty)
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp_ltz"))
          .as("o_orderdate_ms"),
        col("o_totalprice"), col("tq").cast("double").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
      .limit(k)
  }

  /** Q21 shape — EXISTS + NOT EXISTS over the same child table: orders
    * with at least one returned line (LEFT SEMI) and NO line shipped on or
    * after the cutoff (LEFT ANTI), counted per priority. Both subqueries
    * ship only (orderkey) through their shuffles; neither multiplies
    * orders by their line count the way inner-join+distinct would. */
  def returnedSettledOrders(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .join(lineitem
        .filter(col("l_shipdate") >= to_timestamp(lit("1999-01-01")))
        .select(col("l_orderkey").as("late_orderkey")),
        col("o_orderkey") === col("late_orderkey"), "left_anti")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  /** Q22 shape — global scalar subquery + anti join: customers whose
    * balance beats the average positive balance (the 1-row aggregate rides
    * a broadcast nested-loop join, the scalar-subquery physical shape) and
    * who placed no urgent order (LEFT ANTI on the key only), per segment.
    * The average is DECIMAL-sum/count → double, one division — the
    * boundary predicate is deterministic cross-engine. */
  def richIdleCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double") /
        count(lit(1)).cast("double")).as("avg_bal"))
    customer
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
          .as("total_bal"))
  }

  /** Q19 discounted-revenue: three disjunctive brand/size/quantity bands
    * evaluated INSIDE the broadcast-join filter — the fact side streams
    * through one map-side join, no OR-driven plan split. */
  def discountedRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"),
        col("p_size"))), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(disc("l_extendedprice", "l_discount")).cast("double").as("revenue"))

  /** Q12 shape — shipping-class service audit: for lines shipped in one
    * year, count per return flag how many belong to critical-priority
    * orders vs not (the fixtures carry no l_shipmode/commitdate, so the
    * classifier column is l_returnflag and the priority CASE bands stand in
    * for Q12's URGENT/HIGH split — the plan shape is identical: a pushed
    * date band on the fact scan, one fact⋈fact equi-join carrying only the
    * columns the CASE needs, and a conditional-sum aggregate, so the
    * per-group answer is two counters folded in one pass, never two joins). */
  def shippingClassAudit(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))

  /** Q13 shape — customer order-count distribution: how many customers
    * placed exactly k (non-urgent) orders, INCLUDING k = 0. The zero bucket
    * forces the LEFT OUTER join (a semi/inner would drop order-less
    * customers); the aggregate-of-aggregate runs the first count keyed on
    * the customer (fact-keyed shuffle), then the second over the ≤|distinct
    * counts| histogram — the second shuffle is bounded by the distribution's
    * support, not the table. count(o_custkey) (not count(*)) makes the
    * NULL-extended rows count 0, exactly SQL's semantics. */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** Q15 shape — top supplier(s) by quarterly revenue: the revenue "view"
    * is one partial-aggregated shuffle to |suppliers| rows; the max rides a
    * broadcast scalar subquery over that bounded aggregate (like Q22's
    * avg); the equality join back is on the DECIMAL-exact revenue, so the
    * winner set is deterministic cross-engine (no IEEE tie ambiguity —
    * doubles appear only in the displayed column, after the cut). */
  def topSupplierRevenue(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    val revenue = lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-04-01")))
      .groupBy(col("l_suppkey"))
      .agg(sum(disc("l_extendedprice", "l_discount")).as("total_rev"))
    val top = revenue.agg(max(col("total_rev")).as("max_rev"))
    revenue
      .crossJoin(broadcast(top))
      .filter(col("total_rev") === col("max_rev"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
  }
}
