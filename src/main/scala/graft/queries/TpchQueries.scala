package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The full TPC-H 22-query suite, adapted to the driver testdata schema
  * (no partsupp table; stripped columns — each substitution keeps the
  * original operator shape). The reference passes 14/22 and fails
  * Q2/Q15/Q17/Q20 (correlated subquery), Q4/Q21/Q22 (EXISTS) and Q13
  * (complex join predicate) — crates/tests_integ/tpch/
  * 01095_tpch_like_smoke.sql:114-754; Spark runs all 22 natively.
  *
  * Every query is one ANSI string executed verbatim by BOTH Spark and the
  * DuckDB oracle. Money math uses the exact-decimal idiom from [[Q]];
  * quantity sums/avgs are exact because quantities are integer-valued
  * doubles (order-independent in IEEE).
  *
  * Scale notes: all joins are key-equi joins Catalyst plans as broadcast
  * (dims) or shuffle (fact⋈fact); correlated subqueries decorrelate into
  * aggregate+join on the correlation key; top-k ORDER BY+LIMIT fuse into
  * TakeOrderedAndProject.
  */
object TpchQueries {
  import Q._

  private def rev(price: String = "l_extendedprice", disc: String = "l_discount") =
    s"sum(${decSql(price)} * ${oneMinusSql(disc)})"

  private val defs: Seq[(String, String)] = Seq(
    // Q1 pricing summary (full form incl. exact averages)
    "t01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${moneyOutSql(s"sum(${decSql("l_quantity")})")} AS sum_qty,
         |  ${moneyOutSql(s"sum(${decSql("l_extendedprice")})")} AS sum_base_price,
         |  ${moneyOutSql(rev())} AS sum_disc_price,
         |  ${moneyOutSql(s"sum(${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")} * ${onePlusSql("l_tax")})")} AS sum_charge,
         |  CAST(ROUND(CAST(sum(${decSql("l_quantity")}) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_qty,
         |  CAST(ROUND(CAST(sum(${decSql("l_extendedprice")}) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_price,
         |  CAST(ROUND(CAST(sum(${rateSql("l_discount")}) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // Q2 min-cost supplier (correlated scalar subquery — reference FAILS);
    // lineitem stands in for partsupp.
    "t02_min_cost_supplier" ->
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_retailprice
        |FROM part, supplier, lineitem, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size = 15 AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  AND l_extendedprice = (
        |    SELECT min(l2.l_extendedprice)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    // Q3 shipping priority
    "t03_shipping_priority" ->
      s"""SELECT l_orderkey, ${moneyOutSql(rev())} AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,

    // Q4 order priority checking (EXISTS — reference FAILS)
    "t04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Q5 local supplier volume (6-way join)
    "t05_local_supplier_volume" ->
      s"""SELECT n_name, ${moneyOutSql(rev())} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    // Q6 forecasting revenue change
    "t06_forecast_revenue" ->
      s"""SELECT ${moneyOutSql(s"sum(${decSql("l_extendedprice")} * ${rateSql("l_discount")})")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    // Q7 volume shipping between two nations
    "t07_volume_shipping" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  ${moneyOutSql("sum(volume)")} AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(extract(YEAR FROM l_shipdate) AS INT) AS l_year,
         |    ${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")} AS volume
         |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
         |) shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    // Q8 national market share
    "t08_market_share" ->
      s"""SELECT o_year,
         |  CAST(ROUND(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |    / CAST(sum(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
         |FROM (
         |  SELECT CAST(extract(YEAR FROM o_orderdate) AS INT) AS o_year,
         |    ${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")} AS volume,
         |    n2.n_name AS nation
         |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
         |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
         |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
         |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
         |    AND p_type = 'ECONOMY'
         |) all_nations
         |GROUP BY o_year
         |ORDER BY o_year""".stripMargin,

    // Q9 product type profit (LIKE over p_name)
    "t09_product_profit" ->
      s"""SELECT nation, o_year, ${moneyOutSql("sum(amount)")} AS sum_profit
         |FROM (
         |  SELECT n_name AS nation,
         |    CAST(extract(YEAR FROM o_orderdate) AS INT) AS o_year,
         |    ${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")} AS amount
         |  FROM part, supplier, lineitem, orders, nation
         |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
         |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
         |    AND p_name LIKE '%red%'
         |) profit
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin,

    // Q10 returned item reporting
    "t10_returned_items" ->
      s"""SELECT c_custkey, c_name, ${moneyOutSql(rev())} AS revenue,
         |  c_acctbal, n_name
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-07-01'
         |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    // Q11 important stock identification (uncorrelated scalar subquery
    // threshold; lineitem value stands in for partsupp value)
    "t11_important_stock" ->
      s"""SELECT l_partkey, ${moneyOutSql(s"sum(${decSql("l_extendedprice")})")} AS value
         |FROM lineitem, supplier, nation
         |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |  AND n_name = 'NATION_3'
         |GROUP BY l_partkey
         |HAVING CAST(sum(${decSql("l_extendedprice")}) AS DOUBLE) > (
         |  SELECT CAST(sum(${decSql("l_extendedprice")}) AS DOUBLE) * 0.001
         |  FROM lineitem, supplier, nation
         |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |    AND n_name = 'NATION_3')
         |ORDER BY value DESC, l_partkey""".stripMargin,

    // Q12 shipping modes / priority classes (l_returnflag stands in for
    // l_shipmode)
    "t12_priority_classes" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Q13 customer order distribution (complex outer-join predicate —
    // reference FAILS)
    "t13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // Q14 promotion effect (LIKE + conditional share)
    "t14_promo_effect" ->
      s"""SELECT CAST(ROUND(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
         |    THEN ${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")}
         |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |  / CAST(${rev()} AS DOUBLE), 4) AS DOUBLE) AS promo_revenue
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,

    // Q15 top supplier (CTE revenue view + max scalar subquery —
    // reference FAILS the view form)
    "t15_top_supplier" ->
      s"""WITH revenue0 AS (
         |  SELECT l_suppkey AS supplier_no, ${rev()} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-04-01'
         |  GROUP BY l_suppkey
         |)
         |SELECT s_suppkey, s_name,
         |  ${moneyOutSql("total_revenue")} AS total_revenue
         |FROM supplier, revenue0
         |WHERE s_suppkey = supplier_no
         |  AND total_revenue = (SELECT max(total_revenue) FROM revenue0)
         |ORDER BY s_suppkey""".stripMargin,

    // Q16 parts/supplier relationship (NOT IN subquery + NOT LIKE)
    "t16_parts_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#4' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // Q17 small-quantity-order revenue (correlated avg — reference FAILS)
    "t17_small_quantity" ->
      s"""SELECT CAST(ROUND(CAST(sum(${decSql("l_extendedprice")}) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
         |  AND l_quantity < (
         |    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
         |    WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // Q18 large volume customer (IN over grouped HAVING subquery)
    "t18_large_volume" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
         |  ${moneyOutSql(decSql("o_totalprice"))} AS total,
         |  ${moneyOutSql(s"sum(${decSql("l_quantity")})")} AS sum_qty
         |FROM customer, orders, lineitem
         |WHERE o_orderkey IN (
         |    SELECT l_orderkey FROM lineitem
         |    GROUP BY l_orderkey HAVING sum(l_quantity) > 180)
         |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
         |LIMIT 100""".stripMargin,

    // Q19 discounted revenue (disjunction of conjunctive predicates)
    "t19_discounted_revenue" ->
      s"""SELECT ${moneyOutSql(rev())} AS revenue
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey
         |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |        AND l_quantity BETWEEN 1 AND 11)
         |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |        AND l_quantity BETWEEN 10 AND 20)
         |    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 20 AND 30))""".stripMargin,

    // Q20 potential part promotion (nested IN + correlated avg —
    // reference FAILS)
    "t20_part_promotion" ->
      """SELECT s_name, s_acctbal
        |FROM supplier, nation
        |WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (
        |        SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |      AND l_quantity > (
        |        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        |        WHERE l2.l_partkey = l_partkey))
        |ORDER BY s_name""".stripMargin,

    // Q21 suppliers who kept orders waiting (EXISTS + NOT EXISTS —
    // reference FAILS)
    "t21_suppliers_waiting" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    // Q22 global sales opportunity (NOT EXISTS + exact-decimal avg
    // threshold; nationkey digit stands in for the phone prefix)
    "t22_sales_opportunity" ->
      s"""SELECT cntrycode, count(*) AS numcust,
         |  ${moneyOutSql(s"sum(${decSql("c_acctbal")})")} AS totacctbal
         |FROM (
         |  SELECT c_nationkey % 5 AS cntrycode, c_acctbal
         |  FROM customer
         |  WHERE c_nationkey % 5 IN (0, 1, 2)
         |    AND c_acctbal > (
         |      SELECT CAST(sum(${decSql("c_acctbal")}) AS DOUBLE) / count(*)
         |      FROM customer WHERE c_acctbal > 0.0)
         |    AND NOT EXISTS (
         |      SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |        AND o_orderpriority = '1-URGENT')
         |) custsale
         |GROUP BY cntrycode
         |ORDER BY cntrycode""".stripMargin
  )

  /** Spark-arm overrides where the declared (oracle) text plans poorly.
    *
    * t02: the correlated min subquery makes Catalyst decorrelate into an
    * aggregate + join with a SECOND full scan of lineitem (plus its own
    * supplier/nation/region join chain). Both the outer rows and the
    * per-part minimum derive from the SAME EUROPE-joined lineitem
    * relation, so compute it once and take the minimum as a window over
    * l_partkey — one lineitem scan, one join chain (guide §2.4: two
    * operations keyed the same way share one pass). Equivalence: the
    * outer row set IS the EUROPE join (so every retained row's partition
    * is non-empty, exactly the rows for which the correlated subquery
    * returned non-NULL), and `price = min-per-partkey` keeps the same
    * ties. Oracle text unchanged; hash-gated.
    */
  private val sparkOverrides: Map[String, String] = Map(
    "t02_min_cost_supplier" ->
      """WITH eu AS (
        |  SELECT l_partkey, l_extendedprice, s_acctbal, s_name, n_name
        |  FROM supplier, lineitem, nation, region
        |  WHERE s_suppkey = l_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |), best AS (
        |  SELECT *, min(l_extendedprice) OVER (PARTITION BY l_partkey) AS mn
        |  FROM eu
        |)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_retailprice
        |FROM part, best
        |WHERE p_partkey = l_partkey AND p_size = 15 AND l_extendedprice = mn
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (name, sql) =>
      val sparkSql = sparkOverrides.getOrElse(name, sql)
      name -> { (s: SparkSession, dir: String) =>
        Tables.registerAll(s, dir)
        s.sql(sparkSql)
      }
    }.toMap

  val oracles: Map[String, String] = defs.toMap
}
