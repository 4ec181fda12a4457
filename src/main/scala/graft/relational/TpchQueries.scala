package graft.relational

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-shaped relational core: the bench headliners that exercise the
  * engine's scan/filter/join/agg paths on the driver's star schema.
  *
  * Scale notes (100 TB): every query below is a declarative plan —
  * Catalyst pushes the filters into the parquet scan, prunes columns,
  * and picks broadcast joins for the dimension tables (region/nation/
  * supplier/customer are tiny relative to lineitem/orders at any SF).
  * Aggregations are partial (map-side combine) before the single
  * hash-partition shuffle on the group keys.
  */
object TpchQueries {

  /** Pricing summary report (TPC-H Q1 shape). One shuffle on the 2 flag
    * columns; everything else is map-side. */
  def q1(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.roundEps(sum(col("l_quantity")), 2).as("sum_qty"),
        Num.roundEps(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        Num.roundEps(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        Num.roundEps(avg(col("l_quantity")), 6).as("avg_qty"),
        Num.roundEps(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Shipping priority (Q3 shape): join customer⋈orders⋈lineitem, agg,
    * top-10. customer is broadcast; orders⋈lineitem shuffles on orderkey. */
  def q3(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("date"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("date"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(Num.roundEps(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Regional revenue (Q5 shape): 5-way join; all dims broadcast, the
    * only shuffle is lineitem⋈orders on orderkey + final tiny agg. */
  def q5(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1994-01-01").cast("date") &&
        col("o_orderdate") < lit("1996-01-01").cast("date"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey") &&
        sup("s_nationkey") === cust("c_nationkey"))
      .join(broadcast(nation), sup("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Num.roundEps(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  /** Forecasting revenue change (Q6 shape): pure scan-filter-agg; the
    * filters land in PushedFilters, zero shuffle beyond the final agg. */
  def q6(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1994-01-01").cast("date") &&
        col("l_shipdate") < lit("1995-01-01").cast("date") &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(Num.roundEps(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))
  }

  /** Large-volume customer (Q18 shape): agg + having + semi-join back. */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    ord.join(big, ord("o_orderkey") === big("l_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        Num.roundEps(col("o_totalprice"), 2).as("o_totalprice"),
        Num.roundEps(col("total_qty"), 2).as("total_qty"))
  }

  /** Returned-item reporting (Q10 shape): agg over a 3-way join,
    * top-20 revenue customers. lineitem⋈orders shuffles on orderkey;
    * customer/nation broadcast. */
  def q10(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-10-01").cast("date") &&
        col("o_orderdate") < lit("1996-10-01").cast("date"))
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val cust = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_mktsegment"))
      .agg(Num.roundEps(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Order-priority checking (Q4 shape): EXISTS rewritten as a left-semi
    * join — at scale the semi-join shuffles only the (distinct) order
    * keys of the matching lineitems, never the payload. */
  def q4(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-01-01").cast("date"))
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    ord.join(returned, ord("o_orderkey") === returned("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Volume shipping (Q7 shape): supplier-nation × customer-nation
    * revenue by ship year for two nations. Both nation sides resolve
    * through broadcast dims; the one big shuffle is lineitem⋈orders. */
  def q7(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val nation = Tables.nation(spark, dir)
      .filter(col("n_name").isin(pair: _*))
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("date") &&
        col("l_shipdate") <= lit("1996-12-31").cast("date"))
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Num.roundEps(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  /** Promotion effect (Q14 shape): conditional aggregation over a
    * broadcast part join — promo revenue share of one ship month. */
  def q14(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("date") &&
        col("l_shipdate") < lit("1996-04-01").cast("date"))
    val part = Tables.part(spark, dir)
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(Num.roundEps(
        lit(100.0) * sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(0.0)) /
          sum(rev), 6).as("promo_revenue"))
  }

  /** Parts/supplier relationship (Q16 shape): count distinct suppliers
    * per brand/size from the fact table — the distinct shuffles
    * (brand, size, suppkey) triples only. */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(1, 7, 14, 21, 28, 35))
    Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Discounted revenue (Q19 shape): disjunction of brand/size/quantity
    * conjunctions — all pushable scan predicates after the broadcast
    * part join. */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#3" && col("l_quantity").between(1, 11) &&
          col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#9" && col("l_quantity").between(10, 20) &&
          col("p_size").between(1, 25)) ||
        (col("p_brand") === "Brand#15" && col("l_quantity").between(20, 30) &&
          col("p_size").between(1, 35)))
      .agg(Num.roundEps(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  /** Global sales opportunity (Q22 shape): above-average-balance
    * customers with no urgent orders — scalar-subquery agg (broadcast)
    * + a left-anti join on the order keys. ("no orders at all" is
    * vacuous on this synthetic corpus — every customer orders.) */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val rich = cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    rich.join(ord, rich("c_custkey") === ord("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        Num.roundEps(sum(col("c_acctbal")), 2).as("totacctbal"))
  }

  /** Customer order-count distribution (Q13 shape): LEFT OUTER join so
    * zero-order customers survive, then a second aggregation over the
    * per-customer counts. Both aggs are partial map-side; the outer
    * join shuffles on custkey (orders side pre-filtered). */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Top-revenue supplier (Q15 shape): quarterly revenue per supplier,
    * suppliers matching the scalar-subquery max. The max is a 1-row
    * broadcast; revenue is rounded BEFORE the equality so both engines
    * compare identical doubles (SURVEY §4). */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("date") &&
        col("l_shipdate") < lit("1995-04-01").cast("date"))
      .groupBy(col("l_suppkey"))
      .agg(Num.roundEps(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(mx), col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** National market share (Q8 shape): the share of one supplier nation
    * in a region's revenue for one part type, by order year. Every
    * dimension (part, supplier, customer-with-region, both nations)
    * broadcasts; the only big shuffle is lineitem⋈orders on orderkey,
    * and the conditional-share division happens after a two-row agg. */
  def q8(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
    // customers resolved to the target region (broadcast chain of tiny dims)
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val part = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
        col("o_orderdate") <= lit("1996-12-31").cast("date"))
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(Num.roundEps(
        sum(when(col("supp_nation") === "NATION_3", vol).otherwise(0.0)) / sum(vol),
        6).as("mkt_share"))
  }

  /** Small-quantity-order revenue (Q17 shape): lineitems under 20% of
    * their part's average quantity. The correlated scalar subquery
    * becomes a per-part aggregate joined back; both sides derive from
    * the SAME part-filtered scan, so the per-part averages aggregate
    * only the filtered fact rows (shuffle on partkey), never the full
    * table. (The schema has no p_container — brand + size bounds stand
    * in for the reference predicate.) */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#13" && col("p_size") < 15)
      .select(col("p_partkey"))
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
    val lim = li.groupBy(col("l_partkey").as("k"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_lim"))
    li.join(broadcast(lim), col("l_partkey") === col("k"))
      .filter(col("l_quantity") < col("qty_lim"))
      .agg(Num.roundEps(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** Minimum-cost supplier (Q2 shape). The schema has no partsupp, so
    * the supply cost is lineitem-DERIVED: cost(part, supplier) = the
    * minimum unit price (extendedprice/quantity) that supplier ever
    * charged for that part — which preserves Q2's essence, a correlated
    * min over a (part, supplier) relation joined back to pick the
    * cheapest supplier per part, with the supplier side pre-filtered to
    * one region through broadcast dims. Cost is rounded BEFORE the
    * min-equality so both engines compare identical doubles (the q15
    * pattern). The per-part minima table is ~#parts rows → broadcast
    * join-back, never a shuffle. */
  def q2(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val part = Tables.part(spark, dir)
      .filter(col("p_size") === 7 && col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_name"))
    val cost = Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(sup.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(Num.roundEps(min(col("l_extendedprice") / col("l_quantity")), 2)
        .as("cost"))
    val minCost = cost.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("cost")).as("min_cost"))
    cost.join(broadcast(minCost),
        col("l_partkey") === col("mk") && col("cost") === col("min_cost"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(Num.roundEps(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_name"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** Product-type profit (Q9 shape): profit per nation per year over a
    * 5-way join (partsupp is absent from the schema, so the supply-cost
    * term uses the part's retail price at a fixed margin —
    * p_retailprice·quantity·0.1 — keeping Q9's join tree and
    * aggregation intact). Every dimension broadcasts; the one big
    * shuffle is lineitem⋈orders on orderkey. */
  def q9(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_name").contains("gear"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      col("p_retailprice") * col("l_quantity") * lit(0.1)
    Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(Num.roundEps(sum(profit), 2).as("sum_profit"))
  }

  /** Important-stock identification (Q11 shape): per-part inventory
    * value from one nation's suppliers, keeping parts above a fraction
    * of the nation's total (partsupp is absent — shipped value
    * l_extendedprice·(1−discount) from that nation's lineitems is the
    * inventory-value proxy; the group-by + scalar-fraction-subquery
    * shape is Q11's). The nation's supplier set broadcasts; the total
    * is a 1-row broadcast; both sides of the fraction compare are
    * rounded (the q20 convention). Completes the 22-query TPC-H sweep. */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = Tables.lineitem(spark, dir)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("part_value"))
    val threshold = value
      .agg(Num.roundEps(sum(col("part_value")) * 0.001, 2).as("thr"))
    value.crossJoin(broadcast(threshold))
      .filter(Num.roundEps(col("part_value"), 2) > col("thr"))
      .select(col("l_partkey"),
        Num.roundEps(col("part_value"), 2).as("part_value"))
  }

  /** Shipping-class priority counts (Q12 shape): conditional two-way
    * counts over the lineitem⋈orders join (the schema has no
    * l_shipmode/commitdate/receiptdate — l_linestatus is the shipping
    * class and the ship-year window stands in for the receipt-date
    * window; the join + conditional-agg shape is Q12's). */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-01-01").cast("date"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus").as("ship_class"))
      .agg(count(when(high, lit(1))).as("high_line_count"),
        count(when(!high, lit(1))).as("low_line_count"))
  }

  /** Excess-shipment suppliers (Q20 shape): suppliers who moved more
    * than half the average shipped quantity of the filtered part family
    * in one year (availqty is absent with partsupp — shipped quantity
    * is the inventory proxy; the nested-IN chain remains semi-join +
    * scalar-subquery). The per-supplier totals are ~#suppliers rows;
    * the threshold is a 1-row broadcast. */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val qty = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-01-01").cast("date"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
    // both sides of the threshold compare are rounded to 2 dp so a
    // float-sum-order difference between engines cannot flip a
    // boundary supplier (SURVEY §4 rounding rule)
    val threshold = qty
      .agg(Num.roundEps(avg(col("total_qty")) * 0.5, 2).as("thr"))
    qty.crossJoin(broadcast(threshold))
      .filter(Num.roundEps(col("total_qty"), 2) > col("thr"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"),
        Num.roundEps(col("total_qty"), 2).as("total_qty"))
  }

  /** Waiting-supplier report (Q21 shape): suppliers who were the ONLY
    * late supplier of a multi-supplier finished order ("late" :=
    * returnflag 'R' — the schema has no receipt/commit dates). The
    * reference formulation is a triple self-reference on lineitem
    * (l1 + EXISTS l2 + NOT EXISTS l3); here it collapses into ONE scan:
    * a per-order aggregate computes (distinct suppliers, distinct late
    * suppliers, the single late supplier, its late-row count), and the
    * EXISTS/NOT-EXISTS pair becomes the filter n_supp > 1 ∧
    * n_late_supp = 1 — no cartesian, no repeated lineitem scan, no
    * pair-wise join. numwait counts l1 ROWS like the reference (an
    * order where the lone late supplier has 2 late lineitems counts
    * twice). */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val late = col("l_returnflag") === "R"
    // cascaded aggregation instead of two countDistincts: a multi-
    // distinct agg plans an Expand (3× every row before the shuffle);
    // pre-aggregating on (order, supplier) first shuffles raw rows once
    // with map-side combine, and the order-level rollup then shuffles
    // only the already-collapsed (order, supplier) pairs
    val perOrder = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(late, 1).otherwise(0)).as("is_late"),
        count(when(late, lit(1))).as("supp_late_rows"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(col("is_late")).as("n_late_supp"),
        max(when(col("is_late") === 1, col("l_suppkey"))).as("late_supp"),
        sum(when(col("is_late") === 1, col("supp_late_rows"))
          .otherwise(0L)).as("late_rows"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    perOrder.join(broadcast(sup), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_rows")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supp" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    round((min(l_extendedprice / l_quantity)) + 1e-5, 2) AS cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_size = 7 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
        |  GROUP BY 1, 2)
        |SELECT round(s_acctbal + 1e-5, 2) AS s_acctbal, s_name, n_name,
        |  p_partkey, p_name, cost
        |FROM cost
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE cost = (SELECT min(c2.cost) FROM cost c2
        |              WHERE c2.l_partkey = cost.l_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |round((sum(l_extendedprice*(1-l_discount)
        |           - p_retailprice*l_quantity*0.1)) + 1e-5, 2) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2""".stripMargin,
    "q11_important_stock" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    sum(l_extendedprice * (1 - l_discount)) AS part_value
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation
        |      ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3')
        |  GROUP BY 1)
        |SELECT l_partkey, round(part_value + 1e-5, 2) AS part_value
        |FROM pv
        |WHERE round(pv.part_value + 1e-5, 2) >
        |  (SELECT round(sum(p2.part_value) * 0.001 + 1e-5, 2) FROM pv p2)"""
        .stripMargin,
    "q12_ship_class" ->
      """SELECT l_linestatus AS ship_class,
        |count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 END) AS high_line_count,
        |count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |GROUP BY 1""".stripMargin,
    "q20_excess_supp" ->
      """WITH qty AS (
        |  SELECT l_suppkey, sum(l_quantity) AS total_qty
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE 'small%')
        |  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  GROUP BY 1)
        |SELECT s_name, n_name, round(total_qty + 1e-5, 2) AS total_qty
        |FROM qty
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE round(qty.total_qty + 1e-5, 2) >
        |  (SELECT round(0.5 * avg(q2.total_qty) + 1e-5, 2) FROM qty q2)""".stripMargin,
    "q21_wait_supp" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |AND n_name = 'NATION_3'
        |AND EXISTS (SELECT 1 FROM lineitem l2
        |            WHERE l2.l_orderkey = l1.l_orderkey
        |            AND l2.l_suppkey <> l1.l_suppkey)
        |AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                WHERE l3.l_orderkey = l1.l_orderkey
        |                AND l3.l_suppkey <> l1.l_suppkey
        |                AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |round((sum(CASE WHEN n2.n_name = 'NATION_3'
        |             THEN l_extendedprice*(1-l_discount) ELSE 0 END) /
        |       sum(l_extendedprice*(1-l_discount))) + 1e-9, 6) AS mkt_share
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        |GROUP BY 1""".stripMargin,
    "q17_small_qty" ->
      """SELECT round((sum(l_extendedprice) / 7.0) + 1e-5, 2) AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#13' AND p_size < 15
        |AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                  FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""
        .stripMargin,
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey) t
        |GROUP BY c_count""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round((sum(l_extendedprice * (1 - l_discount))) + 1e-9, 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, rev.total_revenue
        |FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
        |WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |AND EXISTS (SELECT 1 FROM lineitem
        |            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,
    "q7_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |CAST(year(l_shipdate) AS INT) AS l_year,
        |round((sum(l_extendedprice*(1-l_discount))) + 1e-5, 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_3','NATION_7')
        |AND cn.n_name IN ('NATION_3','NATION_7')
        |AND sn.n_name <> cn.n_name
        |AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        |GROUP BY 1, 2, 3""".stripMargin,
    "q14_promo" ->
      """SELECT round((100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
        |  THEN l_extendedprice*(1-l_discount) ELSE 0 END) /
        |  sum(l_extendedprice*(1-l_discount))) + 1e-9, 6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'"""
        .stripMargin,
    "q16_parts_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 7, 14, 21, 28, 35)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q19_brand_disc" ->
      """SELECT round((sum(l_extendedprice*(1-l_discount))) + 1e-5, 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#3' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#9' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 25)
        |   OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 35)"""
        .stripMargin,
    "q22_idle_cust" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |round((sum(c_acctbal)) + 1e-5, 2) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey""".stripMargin,
    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name, c_mktsegment,
        |round((sum(l_extendedprice*(1-l_discount))) + 1e-5, 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R' AND o_orderdate >= DATE '1995-10-01'
        |AND o_orderdate < DATE '1996-10-01'
        |GROUP BY c_custkey, c_name, n_name, c_mktsegment
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |round((sum(l_quantity)) + 1e-5, 2) AS sum_qty,
        |round((sum(l_extendedprice)) + 1e-5, 2) AS sum_base_price,
        |round((sum(l_extendedprice*(1-l_discount))) + 1e-5, 2) AS sum_disc_price,
        |round((avg(l_quantity)) + 1e-9, 6) AS avg_qty,
        |round((avg(l_discount)) + 1e-9, 6) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, strftime(o_orderdate,'%Y-%m-%d') AS o_orderdate,
        |o_orderpriority,
        |round((sum(l_extendedprice*(1-l_discount))) + 1e-5, 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_rev" ->
      """SELECT n_name,
        |round((sum(l_extendedprice*(1-l_discount))) + 1e-5, 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1994-01-01'
        |AND o_orderdate < DATE '1996-01-01'
        |GROUP BY n_name""".stripMargin,
    "q6_forecast" ->
      """SELECT round((sum(l_extendedprice*l_discount)) + 1e-5, 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
        |AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,
    "q18_large_cust" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |strftime(o_orderdate,'%Y-%m-%d') AS o_orderdate,
        |round((o_totalprice) + 1e-5, 2) AS o_totalprice, round((total_qty) + 1e-5, 2) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty FROM lineitem
        |      GROUP BY l_orderkey HAVING sum(l_quantity) > 150) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin
  )
}
