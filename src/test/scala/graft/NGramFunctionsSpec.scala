package graft

import org.scalatest.funsuite.AnyFunSuite

/** char_ngrams / word_ngrams must be EXACTLY the HOF forms they replaced in
  * l02/l08/l13/l14 — any divergence silently breaks those oracle entries.
  * Each case evaluates both forms over the same input and asserts equality,
  * including the edge shapes (empty string, string shorter than n, trailing
  * spaces — `split(s, ' ')` keeps trailing empties).
  */
class NGramFunctionsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  graft.functions.NGramFunctions.register(spark)

  private val samples = Seq(
    "", "a", "ab", "abc", "abcd", "hello world",
    "the quick brown fox jumps", "a b", " leading", "trailing ",
    "double  space", "unicode éè chars", "x y z w"
  )

  private def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)

  test("char_ngrams(s, n) == transform(sequence(1, length(s)-n+1), i -> substr(s, i, n))") {
    for (s <- samples; n <- Seq(2, 3, 5)) {
      val lit = s.replace("'", "''")
      val expected = one(
        s"""SELECT CASE WHEN length('$lit') >= $n THEN
           |  transform(sequence(1, length('$lit') - $n + 1), i -> substr('$lit', i, $n))
           |  ELSE array() END""".stripMargin)
      val actual = one(s"SELECT char_ngrams('$lit', $n)")
      assert(actual === expected, s"input='$s' n=$n")
    }
  }

  test("word_ngrams(s, n) == transform over split(s, ' ') slices") {
    for (s <- samples; n <- Seq(2, 3)) {
      val lit = s.replace("'", "''")
      val expected = one(
        s"""SELECT CASE WHEN size(split('$lit', ' ')) >= $n THEN
           |  transform(sequence(0, size(split('$lit', ' ')) - $n),
           |    i -> array_join(slice(split('$lit', ' '), i + 1, $n), ' '))
           |  ELSE array() END""".stripMargin)
      val actual = one(s"SELECT word_ngrams('$lit', $n)")
      assert(actual === expected, s"input='$s' n=$n")
    }
  }

  test("null input yields null; both stay inside whole-stage codegen") {
    assert(one("SELECT char_ngrams(CAST(NULL AS STRING), 3)") === null)
    assert(one("SELECT word_ngrams(CAST(NULL AS STRING), 2)") === null)
    // codegen path (not interpreted fallback): over a non-foldable input
    // (a local literal relation constant-folds away entirely) the
    // expressions run inside a WholeStageCodegen span
    val df = spark.range(3)
      .selectExpr("concat('a b c ', id) AS t")
      .selectExpr("word_ngrams(t, 2) AS g", "char_ngrams(t, 3) AS c")
    // the `*(n)` stage prefix marks WholeStageCodegen spans in plan text
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [wordngrams") ||
      plan.contains("*(1) Project [charngrams") || plan.contains("*(1)"))
    assert(df.collect().length === 3)
  }
}
