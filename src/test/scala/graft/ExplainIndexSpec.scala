package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** CH EXPLAIN variants (AST/SYNTAX/PLAN/PIPELINE mapped onto this
  * engine's layers) and data-skipping-index DDL acceptance (parquet
  * footer min/max + bloom are the native analogs).
  */
class ExplainIndexSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  test("EXPLAIN SYNTAX shows the REWRITTEN SQL the dialect layer hands " +
    "Spark; AST shows the parsed statement; PIPELINE shows codegen stages") {
    g.sql("DROP TABLE IF EXISTS ei_t")
    g.sql("CREATE TABLE ei_t(k Int64, v Int64)")
    val syntax = g.sql("EXPLAIN SYNTAX SELECT count() FROM ei_t " +
      "LIMIT 1, 2").collect().map(_.getString(0)).mkString("\n")
    assert(syntax.toLowerCase.contains("count(*)"),
      s"count() must appear rewritten: $syntax")
    assert(syntax.toLowerCase.contains("offset"), syntax)
    val ast = g.sql("EXPLAIN AST SELECT 1").collect()
      .map(_.getString(0)).mkString("\n")
    assert(ast.contains("Select"), ast)
    val pipe = g.sql("EXPLAIN PIPELINE SELECT k, count(*) FROM ei_t " +
      "GROUP BY k").collect().map(_.getString(0)).mkString("\n")
    assert(pipe.contains("WholeStageCodegen"), pipe)
    val plan = g.sql("EXPLAIN SELECT sum(v) FROM ei_t").collect()
      .map(_.getString(0)).mkString("\n")
    assert(plan.contains("HashAggregate"), plan)
    g.sql("DROP TABLE ei_t")
  }

  test("INDEX clauses in CREATE TABLE are accepted (skipping indexes: " +
    "parquet stats are the native analog) and the table works") {
    g.sql("DROP TABLE IF EXISTS ei_idx")
    g.sql("""CREATE TABLE ei_idx (
      k Int64,
      s String,
      v Float64,
      INDEX k_minmax k TYPE minmax GRANULARITY 4,
      INDEX s_bloom s TYPE bloom_filter(0.01) GRANULARITY 8,
      INDEX ngr lower(s) TYPE ngrambf_v1(3, 256, 2, 0) GRANULARITY 1
    ) ENGINE=MergeTree ORDER BY k""")
    g.sql("INSERT INTO ei_idx VALUES (1, 'a', 0.5), (2, 'b', 1.5)")
    assert(g.sql("SELECT count() AS n FROM ei_idx WHERE k = 2")
      .collect()(0).getLong(0) === 1L)
    // the create script keeps the clause for SHOW CREATE fidelity
    val script = g.sql("SHOW CREATE TABLE ei_idx").collect()(0).getString(0)
    assert(script.toLowerCase.contains("index k_minmax"), script)
    g.sql("DROP TABLE ei_idx")
  }

  test("DESC (SELECT ...) reports the query's result schema with CH " +
    "type names") {
    val rows = g.sql("DESCRIBE (SELECT 1 AS a, 'x' AS b, " +
      "CAST(NULL AS BIGINT) AS c, toDate('2024-01-01') AS d)").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows("a") === "Int32")
    assert(rows("b") === "String")
    assert(rows("c") === "Nullable(Int64)")
    // Spark's analysis marks the cast nullable; the wrapper is honest
    assert(rows("d") === "Nullable(Date)")
  }

  test("WITH FILL INTERPOLATE carries the last real value onto filled " +
    "rows; real rows keep their own (including real NULLs)") {
    g.sql("DROP TABLE IF EXISTS ei_fill")
    g.sql("CREATE TABLE ei_fill(k Int64, v Int64, w Int64)")
    g.sql("INSERT INTO ei_fill VALUES (1, 10, 100), (4, 40, NULL), (6, 60, 600)")
    val rows = g.sql("SELECT k, v, w FROM ei_fill " +
      "ORDER BY k WITH FILL FROM 1 TO 8 INTERPOLATE (v)").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(rows.map(_._1).toSeq === (1L to 7L))
    // v interpolates on filled rows (2, 3 carry 10; 5 carries 40; 7 carries 60)
    assert(rows.map(_._2).toSeq === Seq(Some(10L), Some(10L), Some(10L),
      Some(40L), Some(40L), Some(60L), Some(60L)))
    // w is NOT interpolated: null on filled rows, and k=4's REAL null stays
    assert(rows.map(_._3).toSeq === Seq(Some(100L), None, None, None,
      None, Some(600L), None))
    // the AS-expression form is iterative in CH and rejected loudly here
    intercept[Exception] {
      g.sql("SELECT k, v FROM ei_fill ORDER BY k WITH FILL FROM 1 TO 8 " +
        "INTERPOLATE (v AS v + 1)").collect()
    }
    g.sql("DROP TABLE ei_fill")
  }
}
