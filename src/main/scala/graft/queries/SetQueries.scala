package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Set operations, CTEs, subqueries, grouping sets — SURVEY.md §2.6.
  * UNION/INTERSECT/EXCEPT exist in the reference (sql/planner.rs:253-271,
  * INTERSECT/EXCEPT rewritten to semi/anti joins); correlated subqueries,
  * EXISTS and GROUPING SETS/ROLLUP/CUBE do NOT (TPC-H Q2/Q4/Q15/Q17/Q20/
  * Q21/Q22 fail) — Spark runs all of them natively, shipping a superset.
  */
object SetQueries {
  import Q._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // UNION ALL then aggregate (physical_plan/union.rs).
    "s01_union_all" -> { (s, dir) =>
      val a = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("custkey"))
      val b = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      a.union(b)
        .groupBy(col("custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("custkey"))
    },

    // UNION (distinct) — reference plans UNION as union+group-by-all.
    "s02_union_distinct" -> { (s, dir) =>
      val a = Tables(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nationkey"))
      val b = Tables(s, dir, "supplier").filter(col("s_acctbal") > 9000)
        .select(col("s_nationkey").as("nationkey"))
      a.union(b).distinct().orderBy(col("nationkey"))
    },

    // INTERSECT (rewritten to left-semi in both engines).
    "s03_intersect" -> { (s, dir) =>
      val a = Tables(s, dir, "customer").filter(col("c_acctbal") > 8000)
        .select(col("c_nationkey").as("nationkey"))
      val b = Tables(s, dir, "supplier").filter(col("s_acctbal") > 8000)
        .select(col("s_nationkey").as("nationkey"))
      a.intersect(b).orderBy(col("nationkey"))
    },

    // EXCEPT (rewritten to left-anti in both engines). The supplier side
    // filters to top-acctbal suppliers so the subtrahend covers SOME but
    // not ALL nations at every SF — the unfiltered form matched on
    // empty==empty (suppliers cover all 25 nations), which cannot
    // distinguish EXCEPT from an over-subtracting rewrite (VERDICT r11 #2).
    "s04_except" -> { (s, dir) =>
      val a = Tables(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"))
      val b = Tables(s, dir, "supplier").filter(col("s_acctbal") > 9500)
        .select(col("s_nationkey").as("nationkey"))
      a.except(b).orderBy(col("nationkey"))
    },

    // WITH ... CTE chain (grammar bql.pest:99-100) — spark.sql keeps the
    // declarative shape; Catalyst inlines or reuses the CTE as it prefers.
    "s05_cte" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """WITH big_orders AS (
          |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |  WHERE o_totalprice > 250000
          |), seg AS (
          |  SELECT c_custkey, c_mktsegment FROM customer
          |)
          |SELECT c_mktsegment, count(*) AS n,
          |  CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
          |FROM big_orders JOIN seg ON o_custkey = c_custkey
          |GROUP BY c_mktsegment
          |ORDER BY c_mktsegment""".stripMargin)
    },

    // Uncorrelated scalar subquery (fails in the reference's DF-6 planner).
    "s06_scalar_subquery" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderkey, o_totalprice
          |FROM orders
          |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // IN (subquery) — grammar admits it but DF-6 cannot plan it (SURVEY
    // §2.3); Spark plans it as a semi join.
    "s07_in_subquery" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_custkey, c_acctbal
          |FROM customer
          |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
          |                      WHERE n_regionkey = 2)
          |  AND c_acctbal > 9900
          |ORDER BY c_custkey""".stripMargin)
    },

    // Correlated scalar subquery — TPC-H Q17 shape, reference FAILS
    // ("fail: correlated subquery"); Spark decorrelates into a join.
    "s08_correlated_scalar" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0, 2) AS DOUBLE) AS avg_yearly
          |FROM lineitem
          |WHERE l_partkey < 200
          |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
          |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin)
    },

    // ROLLUP (absent from the reference entirely; Spark native).
    "s09_rollup" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          moneyOut(sum(dec("l_quantity"))).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // CUBE with grouping() marker columns.
    "s10_cube" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_prio"))
        .select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
          col("g_status"), col("g_prio"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // VALUES literal relation (physical_plan/values.rs) joined to a table.
    "s11_values_relation" -> { (s, dir) =>
      import s.implicits._
      val tiers = Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"))
        .toDF("code", "rname")
      Tables(s, dir, "region")
        .join(broadcast(tiers), col("r_name") === col("rname"), "inner")
        .select(col("code"), col("r_name"))
        .orderBy(col("code"))
    },

    // numbers(N) table function (reference parses it but never wired:
    // bql.pest:349-353) → spark.range, the real distributed equivalent.
    "s12_numbers_range" -> { (s, dir) =>
      s.range(1, 1001)
        .agg(sum(col("id")).as("total"), count(lit(1)).as("n"))
    },

    // Single-scan conditional aggregation: the same result as
    // j05_full_outer_join's two-scan + FULL JOIN plan from ONE pass over
    // orders (j05 stays as the full-outer coverage row; this is the shape
    // a 100 TB plan should prefer when both branches scan the same table).
    "s13_single_scan_pivot" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(
          sum(when(col("o_totalprice") > 400000, 1L).otherwise(0L)).as("n_hi"),
          sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("n_urgent"))
        .filter(col("n_hi") > 0 || col("n_urgent") > 0)
        .orderBy(col("custkey"))
    }
  )

  val oracles: Map[String, String] = Map(
    "s01_union_all" ->
      """SELECT custkey, count(*) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |  UNION ALL
        |  SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |) t GROUP BY custkey ORDER BY custkey""".stripMargin,

    "s02_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
        |ORDER BY nationkey""".stripMargin,

    "s03_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 8000
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000
        |ORDER BY nationkey""".stripMargin,

    "s04_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
        |ORDER BY nationkey""".stripMargin,

    "s05_cte" ->
      """WITH big_orders AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |  WHERE o_totalprice > 250000
        |), seg AS (
        |  SELECT c_custkey, c_mktsegment FROM customer
        |)
        |SELECT c_mktsegment, count(*) AS n,
        |  CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM big_orders JOIN seg ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "s06_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "s07_in_subquery" ->
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_regionkey = 2)
        |  AND c_acctbal > 9900
        |ORDER BY c_custkey""".stripMargin,

    "s08_correlated_scalar" ->
      """SELECT CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0, 2) AS DOUBLE) AS avg_yearly
        |FROM lineitem
        |WHERE l_partkey < 200
        |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,

    "s09_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  ${moneyOutSql(s"""sum(${decSql("l_quantity")})""")} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "s10_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_prio
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "s11_values_relation" ->
      """SELECT code, r_name
        |FROM region
        |JOIN (VALUES (0, 'AFRICA'), (1, 'AMERICA'), (2, 'ASIA')) AS t(code, rname)
        |  ON r_name = rname
        |ORDER BY code""".stripMargin,

    "s12_numbers_range" ->
      """SELECT CAST(sum(range) AS BIGINT) AS total, count(*) AS n
        |FROM range(1, 1001)""".stripMargin,

    "s13_single_scan_pivot" ->
      """SELECT o_custkey AS custkey,
        |  CAST(sum(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
        |FROM orders
        |GROUP BY o_custkey
        |HAVING sum(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) > 0
        |    OR sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) > 0
        |ORDER BY custkey""".stripMargin
  )
}
