package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window-function surface — SURVEY.md §2.6 (reference:
  * crates/datafusion/src/physical_plan/windows/, window_functions.rs:95-124;
  * ranking, analytic and aggregate-over-window with ROWS/RANGE frames).
  *
  * Scale notes: every window here partitions by a key before ordering, so
  * the sort is per-partition after one hash shuffle — no global sort. A
  * window with no PARTITION BY would single-partition 100 TB and is avoided.
  */
object WindowQueries {
  import Q._

  private def topOrders(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .filter(col("o_custkey") < 200)
      .select(col("o_orderkey"), col("o_custkey"),
        dec("o_totalprice").as("price"), col("o_orderdate"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ranking family: row_number/rank/dense_rank/percent_rank/cume_dist/
    // ntile (reference expressions/{row_number,rank,cume_dist}.rs).
    // The (o_orderdate, o_orderkey) sort key is unique per partition, so
    // every ranking function is deterministic.
    "w01_ranking" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      topOrders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          moneyOut(percent_rank().over(w)).as("prnk"),
          moneyOut(cume_dist().over(w)).as("cd"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Analytic family: lag/lead/first_value/last_value/nth_value
    // (reference expressions/{lead_lag,nth_value}.rs).
    "w02_analytic" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      topOrders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          moneyOut(lag(col("price"), 1).over(w)).as("prev_price"),
          moneyOut(lead(col("price"), 1).over(w)).as("next_price"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(wFull).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_ok"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Aggregates over ROWS frames: running total + trailing-3 average
    // (reference windows/aggregate.rs; frame semantics
    // logical_plan/window_frames.rs:130-226).
    "w03_frames_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      topOrders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          moneyOut(sum(col("price"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .as("running_total"),
          moneyOut(sum(col("price"))
            .over(w.rowsBetween(-2, Window.currentRow))).as("trailing3_sum"),
          count(lit(1))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Top-N-per-group, two-phase: a single-phase window over the 5-value
    // c_mktsegment key would sort 1/5 of the fact table in each of 5 tasks
    // at any scale (VERDICT r1 weak item). Phase 1 takes a local top-3 per
    // (segment, input partition) — map-sided, no skew; phase 2 windows only
    // the ≤ 3×partitions surviving candidates per segment. Results are
    // identical: every global top-3 row is a local top-3 row of its
    // partition.
    "w04_topn_per_group" -> { (s, dir) =>
      val localW = Window.partitionBy(col("c_mktsegment"), col("salt"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val globalW = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("salt", spark_partition_id())
        .withColumn("lrn", row_number().over(localW))
        .filter(col("lrn") <= 3)
        .drop("salt", "lrn")
        .withColumn("rn", row_number().over(globalW))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }
  )

  private val oracleBase =
    """(SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price, o_orderdate
      | FROM orders WHERE o_custkey < 200) t""".stripMargin

  val oracles: Map[String, String] = Map(
    "w01_ranking" ->
      s"""SELECT o_custkey, o_orderkey,
         |  row_number() OVER w AS rn,
         |  rank() OVER w AS rnk,
         |  dense_rank() OVER w AS drnk,
         |  CAST(ROUND(percent_rank() OVER w, 2) AS DOUBLE) AS prnk,
         |  CAST(ROUND(cume_dist() OVER w, 2) AS DOUBLE) AS cd,
         |  ntile(4) OVER w AS quartile
         |FROM $oracleBase
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w02_analytic" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(ROUND(lag(price, 1) OVER w, 2) AS DOUBLE) AS prev_price,
         |  CAST(ROUND(lead(price, 1) OVER w, 2) AS DOUBLE) AS next_price,
         |  first_value(o_orderkey) OVER w AS first_ok,
         |  last_value(o_orderkey) OVER wf AS last_ok,
         |  nth_value(o_orderkey, 2) OVER wf AS second_ok
         |FROM $oracleBase
         |WINDOW
         |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w03_frames_running" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(ROUND(sum(price) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
         |  CAST(ROUND(sum(price) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS trailing3_sum,
         |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
         |FROM $oracleBase
         |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w04_topn_per_group" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice
        |FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |) t
        |WHERE rn <= 3
        |ORDER BY c_mktsegment, rn""".stripMargin
  )
}
