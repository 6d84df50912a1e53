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

  test("null input yields null; the expression stays inside codegen") {
    assert(one("SELECT winnow_fingerprints(CAST(NULL AS STRING), 5, 4)") == null)
    // range, not VALUES: a literal row constant-folds to LocalTableScan
    // with no codegen stage to inspect
    val plan = spark.sql(
      "SELECT winnow_fingerprints(concat('abcdefghij', CAST(id AS STRING)), 5, 4) FROM range(2)")
      .queryExecution.executedPlan.toString
    // the '*(n)' operator prefix is executedPlan.toString's marker for a
    // whole-stage-codegen'd span
    assert(plan.contains("*(1) Project"),
      s"winnow_fingerprints must not break whole-stage codegen:\n$plan")
  }
}
