package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmQueries

/** The codegen'd `simhash64_bands` expression must be bit-identical to
  * the explode+64-sum SQL pipeline it replaces on the l11b Spark side
  * (the pipeline remains the DuckDB oracle, so this equality IS the
  * bridge that keeps l11b oracle-green).
  */
class SimhashFunctionsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def exprBands(table: String) = {
    graft.functions.SimhashFunctions.register(spark)
    spark.sql(
      s"""SELECT doc_id, bs[0] AS b0, bs[1] AS b1, bs[2] AS b2, bs[3] AS b3
         |FROM (SELECT doc_id, simhash64_bands(text) AS bs FROM $table
         |      WHERE text IS NOT NULL)""".stripMargin)
  }

  private def sqlBands(table: String) =
    spark.sql(LlmQueries.simhash64Sql(spark = true, table = table,
      finalSelect = "SELECT doc_id, b0, b1, b2, b3 FROM f"))

  test("expression equals the SQL vote pipeline on the whole fixture corpus") {
    Tables.registerAll(spark, SparkTestSession.sf)
    val e = exprBands("documents")
    val q = sqlBands("documents")
    assert(e.count() === q.count())
    assert(e.exceptAll(q).isEmpty && q.exceptAll(e).isEmpty)
  }

  test("expression matches SQL token semantics on edge-case texts") {
    import spark.implicits._
    // empty string (one empty token), consecutive spaces (empty middle
    // token), leading/trailing spaces, multibyte chars, single space
    Seq((1L, ""), (2L, "a  b"), (3L, " x "), (4L, "héllo wörld"),
        (5L, " "), (6L, "one"))
      .toDF("doc_id", "text").createOrReplaceTempView("sh_edge")
    val e = exprBands("sh_edge")
    val q = sqlBands("sh_edge")
    assert(e.count() === 6)
    assert(e.exceptAll(q).isEmpty && q.exceptAll(e).isEmpty)
  }

  test("band values stay in the 16-bit range and codegen applies") {
    Tables.registerAll(spark, SparkTestSession.sf)
    val row = exprBands("documents")
      .selectExpr("max(greatest(b0, b1, b2, b3)) AS mx",
        "min(least(b0, b1, b2, b3)) AS mn").head()
    assert(row.getAs[Int]("mx") <= 0xffff && row.getAs[Int]("mn") >= 0)
  }
}
