package graft

import org.scalatest.funsuite.AnyFunSuite

/** winnow_fingerprints must be EXACTLY the array-function chain it
  * replaced in l16 — any divergence silently breaks that oracle entry.
  * Each case evaluates both forms over the same input, including short
  * strings (below k+w-1), unicode, and long repetitive text (where the
  * window-min dedup actually collapses fingerprints).
  */
class WinnowFunctionsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  graft.functions.WinnowFunctions.register(spark)
  graft.functions.NGramFunctions.register(spark)

  private val samples = Seq(
    "", "abcdefg", "abcdefgh", "abcdefghi", "hello world hello world",
    "the quick brown fox jumps over the lazy dog",
    ("spark row batch " * 40).trim,
    "unicode éèêë chars répartition über",
    "aaaaaaaaaaaaaaaaaaaaaaaa"
  )

  private def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)

  test("winnow_fingerprints(s, k, w) == array_distinct(window-min of " +
    "substr(md5(char_ngrams), 1, 8))") {
    for (s <- samples; (k, w) <- Seq((5, 4), (3, 2), (7, 5))) {
      val lit = s.replace("'", "''")
      val expected = one(
        s"""SELECT CASE WHEN length('$lit') >= $k + $w - 1 THEN
           |  array_distinct(transform(
           |    sequence(0, size(h) - $w), i -> array_min(slice(h, i + 1, $w))))
           |  ELSE array() END
           |FROM (SELECT transform(char_ngrams('$lit', $k),
           |             g -> substr(md5(g), 1, 8)) AS h)""".stripMargin)
      val actual = one(s"SELECT winnow_fingerprints('$lit', $k, $w)")
      assert(actual === expected, s"input='$s' k=$k w=$w")
    }
  }

  test("null input yields null; the GENERATED code runs and agrees") {
    assert(one("SELECT winnow_fingerprints(CAST(NULL AS STRING), 5, 4)") == null)
    // range-derived (non-literal) input: ConstantFolding cannot evaluate
    // it on the driver, so collecting actually RUNS the Janino-compiled
    // doGenCode output — a generated call with a bad signature would fall
    // back to interpreted mode and the plan/value asserts below catch it
    val df = spark.sql(
      """SELECT winnow_fingerprints(t, 5, 4) AS got,
        |  array_distinct(transform(
        |    sequence(0, size(h) - 4), i -> array_min(slice(h, i + 1, 4)))) AS want
        |FROM (SELECT t, transform(char_ngrams(t, 5),
        |             g -> substr(md5(g), 1, 8)) AS h
        |      FROM (SELECT concat('spark row batch value ',
        |                   CAST(id * 37 AS STRING)) AS t FROM range(8)))""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    // the '*(n)' operator prefix is executedPlan.toString's marker for a
    // whole-stage-codegen'd span
    assert(plan.contains("*(1) Project"),
      s"winnow_fingerprints must not break whole-stage codegen:\n$plan")
    df.collect().foreach(r => assert(r.get(0) === r.get(1)))
  }
}
