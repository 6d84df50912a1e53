package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2's inventory appears here as a named query;
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL the driver uses as the
  * correctness oracle (column names/aliases match the Spark result exactly).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ JoinQueries.queries ++ WindowQueries.queries ++
      SetQueries.queries ++ DdlQueries.queries ++ LlmQueries.queries ++
      FuncQueries.queries ++ TpchQueries.queries ++ SourceQueries.queries ++
      AsofRangeQueries.queries ++ BehaviorQueries.queries ++
      AggPackQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ JoinQueries.oracles ++ WindowQueries.oracles ++
      SetQueries.oracles ++ DdlQueries.oracles ++ LlmQueries.oracles ++
      FuncQueries.oracles ++ TpchQueries.oracles ++ SourceQueries.oracles ++
      AsofRangeQueries.oracles ++ BehaviorQueries.oracles ++
      AggPackQueries.oracles
}
