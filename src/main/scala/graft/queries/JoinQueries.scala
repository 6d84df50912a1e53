package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Join surface — SURVEY.md §2.4. The reference supports equi hash joins
  * (Inner/Left/Right/Full/Semi/Anti, crates/datafusion/src/physical_plan/
  * hash_join.rs) with CollectLeft (broadcast) and Partitioned modes; Spark's
  * broadcast/shuffle-hash/sort-merge selection subsumes both. Queries that
  * the reference FAILS (complex join predicates, TPC-H Q13 at
  * crates/tests_integ/tpch/01095_tpch_like_smoke.sql:479) are included —
  * Spark runs them natively, shipping a superset.
  *
  * Scale notes: dimension tables (region/nation/supplier/customer at TPC-H
  * ratios) are broadcast explicitly so fact-side scans never shuffle for
  * them; fact⋈fact joins (lineitem⋈orders) shuffle on the join key, which
  * AQE re-plans at runtime. At 100 TB the same plans hold: broadcast the
  * <8 GB dims, let AQE pick shuffle-hash vs sort-merge for fact⋈fact.
  */
object JoinQueries {
  import Q._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q3-flavored 3-way inner join (reference passes Q3):
    // broadcast the filtered customer dim; lineitem⋈orders shuffles on
    // orderkey only once.
    "j01_join3_revenue_topk" -> { (s, dir) =>
      val cust = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
        .select(col("l_orderkey"),
          (dec("l_extendedprice") * oneMinus("l_discount")).as("rev"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(moneyOut(sum(col("rev"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5-flavored 6-way join through region→nation→(customer,supplier):
    // every dim side broadcast, single shuffle for lineitem⋈orders.
    "j02_join6_local_supplier_volume" -> { (s, dir) =>
      val region = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables(s, dir, "nation")
      val cust = Tables(s, dir, "customer")
      val supp = Tables(s, dir, "supplier")
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val li = Tables(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(moneyOut(sum(dec("l_extendedprice") * oneMinus("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // LEFT OUTER + COUNT over null-extended side — TPC-H Q13 shape, which
    // the reference FAILS ("fail: join predicates"); Spark superset.
    "j03_left_join_order_counts" -> { (s, dir) =>
      val cust = Tables(s, dir, "customer").select("c_custkey")
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // RIGHT OUTER (hash_join.rs JoinType::Right).
    "j04_right_join" -> { (s, dir) =>
      val ord = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 300000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_mktsegment")
      ord.join(cust, col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_big_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("c_mktsegment"))
    },

    // FULL OUTER join on disjoint-ish key ranges (JoinType::Full).
    "j05_full_outer_join" -> { (s, dir) =>
      val hi = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_hi"))
      val urgent = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_urgent"))
      hi.withColumnRenamed("o_custkey", "k1")
        .join(urgent.withColumnRenamed("o_custkey", "k2"),
          col("k1") === col("k2"), "full")
        .select(coalesce(col("k1"), col("k2")).as("custkey"),
          coalesce(col("n_hi"), lit(0L)).as("n_hi"),
          coalesce(col("n_urgent"), lit(0L)).as("n_urgent"))
        .orderBy(col("custkey"))
    },

    // LEFT SEMI = EXISTS (JoinType::Semi; the reference FAILS EXISTS SQL —
    // TPC-H Q4/Q21/Q22 "fail: exists").
    "j06_semi_join_exists" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49).select("l_orderkey")
      Tables(s, dir, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },

    // LEFT ANTI = NOT EXISTS (JoinType::Anti). The subquery filters to
    // high-value orders so BOTH sides of the anti-join are exercised at
    // every SF — the unfiltered form returned 0 rows on this generator
    // (every customer has an order), and empty==empty cannot distinguish
    // a correct anti-join from an over-filtering one (VERDICT r11 #2).
    "j07_anti_join_not_exists" -> { (s, dir) =>
      val ord = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 400000).select("o_custkey")
      Tables(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers_no_orders"))
        .orderBy(col("c_mktsegment"))
    },

    // CROSS JOIN (cross_join.rs) — small×small only, as any sane plan does.
    "j08_cross_join" -> { (s, dir) =>
      val r = Tables(s, dir, "region").select(col("r_name"))
      val n = Tables(s, dir, "nation").select(col("n_name"))
      r.crossJoin(n)
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Non-equi predicate inside the join condition — the reference FAILS
    // these ("fail: join predicates"); Spark evaluates them natively.
    "j09_nonequi_join" -> { (s, dir) =>
      val ord = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 450000)
        .select("o_orderkey", "o_orderdate")
      val li = Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_shipdate", "l_linenumber")
      li.join(ord, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_late_lines"))
        .orderBy(col("o_orderkey"))
    },

    // USING-style join (grammar bql.pest:180-183) + comma-join semantics:
    // implicit cross + WHERE equi-predicate planned as a join.
    "j10_using_join" -> { (s, dir) =>
      val n = Tables(s, dir, "nation")
      val sup = Tables(s, dir, "supplier")
        .withColumnRenamed("s_nationkey", "n_nationkey")
      sup.join(n, Seq("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          moneyOut(sum(dec("s_acctbal"))).as("total_bal"))
        .orderBy(col("n_name"))
    }
  )

  val oracles: Map[String, String] = Map(
    "j01_join3_revenue_topk" ->
      s"""SELECT l_orderkey, o_orderdate,
         |  ${moneyOutSql(s"""sum(${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")})""")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-03-15'
         |  AND l_shipdate > TIMESTAMP '1997-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "j02_join6_local_supplier_volume" ->
      s"""SELECT n_name,
         |  ${moneyOutSql(s"""sum(${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")})""")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "j03_left_join_order_counts" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders
        |             WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "j04_right_join" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_big_orders,
        |  count(*) AS n_rows
        |FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |      WHERE o_totalprice > 300000) o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "j05_full_outer_join" ->
      """SELECT COALESCE(k1, k2) AS custkey,
        |  COALESCE(n_hi, 0) AS n_hi,
        |  COALESCE(n_urgent, 0) AS n_urgent
        |FROM (SELECT o_custkey AS k1, count(*) AS n_hi FROM orders
        |      WHERE o_totalprice > 400000 GROUP BY o_custkey) a
        |FULL OUTER JOIN
        |     (SELECT o_custkey AS k2, count(*) AS n_urgent FROM orders
        |      WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) b
        |  ON k1 = k2
        |ORDER BY custkey""".stripMargin,

    "j06_semi_join_exists" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "j07_anti_join_not_exists" ->
      """SELECT c_mktsegment, count(*) AS n_customers_no_orders
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_totalprice > 400000)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "j08_cross_join" ->
      """SELECT r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "j09_nonequi_join" ->
      """SELECT o_orderkey, count(*) AS n_late_lines
        |FROM lineitem
        |JOIN (SELECT o_orderkey, o_orderdate FROM orders
        |      WHERE o_totalprice > 450000) o
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "j10_using_join" ->
      s"""SELECT n_name, count(*) AS n_suppliers,
         |  ${moneyOutSql(s"""sum(${decSql("s_acctbal")})""")} AS total_bal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin
  )
}
