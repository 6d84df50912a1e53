package graft

import org.scalatest.funsuite.AnyFunSuite

/** f07b's prefilter contract (ADVICE r7): the regex must admit every
  * integer form BOTH engines' casts accept with the same value
  * (space-padded, '+'/'-'-signed, plain), and must reject decimal forms
  * even though each engine's cast accepts them — Spark truncates
  * '3.5' -> 3 while DuckDB rounds -> 4, so admitting them would be a
  * cross-engine wrong answer the shared-regex gate could never see.
  */
class FuncQueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val re = "^ *[+-]?[0-9]+ *$"

  test("f07b prefilter admits exactly the engine-agreeing integer forms") {
    import spark.implicits._
    val rows = Seq(
      ("7", Some(7)), (" 7 ", Some(7)), ("+7", Some(7)), ("-7", Some(-7)),
      (" +07 ", Some(7)),
      // rejected by design: engines disagree on the cast value
      ("3.5", None),
      // rejected: not castable anyway, and the whole point — TRY_CAST
      // never sees them so its throw-and-catch path never runs
      ("x", None), ("", None), ("7x", None), ("--7", None), ("7 7", None))
    val df = rows.map(_._1).toDF("s")
    df.createOrReplaceTempView("f07b_fix")
    val got = spark.sql(
      s"""SELECT s, TRY_CAST(CASE WHEN s RLIKE '$re' THEN trim(s) END AS INT) AS v
         |FROM f07b_fix""".stripMargin)
      .collect().map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Int]))
      .toMap
    rows.foreach { case (s, want) =>
      assert(got(s) == want, s"'$s': got ${got(s)}, want $want")
    }
  }

  test("prefiltered TRY_CAST equals naive TRY_CAST on every admitted form") {
    import spark.implicits._
    // on admitted strings the two shapes must agree exactly — the
    // divergence classes (decimals, exotic whitespace) are only ever
    // REJECTED rows, never differently-valued ones
    val df = Seq("7", " 7 ", "+7", "-7", " +07 ").toDF("s")
    df.createOrReplaceTempView("f07b_adm")
    val diff = spark.sql(
      s"""SELECT count(*) AS n FROM f07b_adm
         |WHERE NOT (TRY_CAST(CASE WHEN s RLIKE '$re' THEN trim(s) END AS INT)
         |           <=> TRY_CAST(s AS INT))""".stripMargin)
      .head.getLong(0)
    assert(diff == 0L)
  }
}
