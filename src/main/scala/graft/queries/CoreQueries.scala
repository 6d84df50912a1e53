package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Shared helpers for oracle-matched queries.
  *
  * Money math is done in exact DECIMAL in BOTH Spark and the DuckDB oracle so
  * aggregate results hash-match bit-for-bit (double summation order differs
  * between engines; decimals do not).
  */
object Q {
  /** Cast a raw double money/quantity column (2 decimal places in the data)
    * to exact decimal(12,2). Kept narrow on purpose: wide inputs make
    * multi-factor products exceed decimal(38) precision, where Spark drops
    * scale (HALF_UP to 6) but DuckDB does not — results then diverge in the
    * 7th decimal. With (12,2)·(8,4)·(8,4) every product stays exact.
    */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  def dec(name: String): Column = dec(col(name))
  /** SQL-side mirror of [[dec]] for the DuckDB oracle. */
  def decSql(name: String): String = s"CAST($name AS DECIMAL(12,2))"
  /** Rate columns (discount/tax: 2 decimals, < 1) → decimal(8,4). */
  def rate(name: String): Column = col(name).cast(DecimalType(8, 4))
  def rateSql(name: String): String = s"CAST($name AS DECIMAL(8,4))"
  /** 1 - discount with matching decimal scale on both sides. */
  def oneMinus(name: String): Column =
    lit(1).cast(DecimalType(8, 4)) - rate(name)
  def oneMinusSql(name: String): String =
    s"(CAST(1 AS DECIMAL(8,4)) - ${rateSql(name)})"
  def onePlus(name: String): Column =
    lit(1).cast(DecimalType(8, 4)) + rate(name)
  def onePlusSql(name: String): String =
    s"(CAST(1 AS DECIMAL(8,4)) + ${rateSql(name)})"
  /** Final-output cast for money aggregates. Round the exact decimal to
    * scale 2 first: a ≤13-digit unscaled value converts to double
    * identically in Spark and DuckDB, while a scale-10 decimal does not
    * (Spark's Decimal.toDouble divides unscaled/10^s in double space and can
    * be 1 ulp off DuckDB's correctly-rounded conversion for >2^53 unscaled).
    */
  def moneyOut(c: Column): Column = round(c, 2).cast("double")
  def moneyOutSql(expr: String): String = s"CAST(ROUND($expr, 2) AS DOUBLE)"
}

/** Core SELECT surface: projection/filter/aggregate/sort/limit —
  * SURVEY.md §2.3, §2.5, §2.6 (reference exec:
  * crates/datafusion/src/physical_plan/{projection,filter,hash_aggregate,sort,limit}.rs).
  */
object CoreQueries {
  import Q._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 pricing summary (reference passes it:
    // crates/tests_integ/tpch/01095_tpch_like_smoke.sql:114).
    // Partial aggregation (map-side combine) + single shuffle on the two
    // low-cardinality group keys; scales linearly with input.
    "q01_agg_pricing_summary" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneyOut(sum(dec("l_quantity"))).as("sum_qty"),
          moneyOut(sum(dec("l_extendedprice"))).as("sum_base_price"),
          moneyOut(sum(dec("l_extendedprice") * oneMinus("l_discount"))).as("sum_disc_price"),
          moneyOut(sum(dec("l_extendedprice") * oneMinus("l_discount") *
            onePlus("l_tax"))).as("sum_charge"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Projection + filter + top-k: Spark fuses ORDER BY+LIMIT into
    // TakeOrderedAndProject (no global sort at scale).
    "q02_filter_topk" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // TPC-H Q6 forecasting revenue change — pure scan+filter+agg, the
    // predicate is fully pushed to parquet row groups.
    "q03_agg_q6_revenue" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(moneyOut(sum(dec("l_extendedprice") * rate("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
    },

    // HAVING over groupBy (reference planner resolves aliases into HAVING:
    // crates/datafusion/src/sql/planner.rs:777-790).
    "q04_having" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(moneyOut(sum(dec("o_totalprice"))).as("total"), count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 5)
        .orderBy(col("o_custkey"))
    },

    // SELECT DISTINCT (reference plans it as group-by-all,
    // bql.pest:110 / SURVEY §2.6).
    "q05_distinct" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // count(DISTINCT) — reference rewrites single-distinct to group-by
    // (optimizer/single_distinct_to_groupby.rs); Spark does the same rewrite.
    "q06_count_distinct" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },

    // CASE WHEN both forms (expressions/case.rs in the reference).
    "q07_case_when" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 50000, "mid")
            .otherwise("small").as("bucket"),
          when(col("o_orderstatus") === "F", 1).otherwise(0).as("is_f"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("is_f")).as("n_f"))
        .orderBy(col("bucket"))
    },

    // IN-list / BETWEEN / IS NULL trio (expressions/in_list.rs, is_null.rs).
    "q08_in_between_null" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(1000, 150000) &&
          col("o_orderdate").isNotNull)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${moneyOutSql(s"""sum(${decSql("l_quantity")})""")} AS sum_qty,
         |  ${moneyOutSql(s"""sum(${decSql("l_extendedprice")})""")} AS sum_base_price,
         |  ${moneyOutSql(s"""sum(${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")})""")} AS sum_disc_price,
         |  ${moneyOutSql(s"""sum(${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")} * ${onePlusSql("l_tax")})""")} AS sum_charge,
         |  min(l_quantity) AS min_qty,
         |  max(l_quantity) AS max_qty,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_topk" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q03_agg_q6_revenue" ->
      s"""SELECT ${moneyOutSql(s"""sum(${decSql("l_extendedprice")} * ${rateSql("l_discount")})""")} AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,

    "q04_having" ->
      s"""SELECT o_custkey, ${moneyOutSql(s"""sum(${decSql("o_totalprice")})""")} AS total,
         |  count(*) AS n_orders
         |FROM orders
         |GROUP BY o_custkey
         |HAVING count(*) >= 5
         |ORDER BY o_custkey""".stripMargin,

    "q05_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q06_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q07_case_when" ->
      """SELECT CASE WHEN o_totalprice > 200000 THEN 'big'
        |            WHEN o_totalprice > 50000 THEN 'mid'
        |            ELSE 'small' END AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,

    "q08_in_between_null" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_totalprice BETWEEN 1000 AND 150000
        |  AND o_orderdate IS NOT NULL
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
