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

  /** The non-rolling reference for cdc_starts: the old l31 aggregate-fold
    * traversal with the window hash recomputed per position as the 8-term
    * integer polynomial (the exact formulation the DuckDB oracle uses).
    * Divergence means the rolling arithmetic (or the code-point handling)
    * is wrong.
    */
  private def cdcFoldSql(text: String): String = {
    val cs = Seq(13163680L, 805498697L, 154885210L, 362470373L,
      16974593L, 66049L, 257L, 1L)
    val poly = cs.zipWithIndex.map { case (c, j) =>
      val pos = if (j == 0) "i" else s"i + $j"
      if (c == 1L) s"ascii(substr($text, $pos, 1))"
      else s"ascii(substr($text, $pos, 1)) * ${c}L"
    }.mkString(" + ")
    s"""concat(array(1), aggregate(sequence(1, length($text)),
       |  struct(CAST(1 AS INT) AS last, CAST(array() AS ARRAY<INT>) AS bs),
       |  (acc, i) -> IF(
       |    (i - acc.last >= 256) OR (i + 7 <= length($text)
       |      AND i - acc.last >= 32
       |      AND ($poly) % 1000000007 % 64 = 0),
       |    struct(i AS last, concat(acc.bs, array(i)) AS bs), acc),
       |  acc -> acc.bs))""".stripMargin
  }

  test("cdc_starts == the per-position polynomial fold (rolling hash " +
    "really rolls)") {
    graft.functions.WinnowFunctions.register(spark)
    // length(text) == 0, < 8, == 8, window-aligned, long enough to force
    // 256-splits, repetitive (many candidates), and unicode
    val cdcSamples = samples ++ Seq(
      ("lorem ipsum dolor sit amet, consectetur adipiscing elit " * 30).trim,
      ("abcdefgh" * 80), ("z" * 600))
    for (s <- cdcSamples) {
      val lit = s.replace("'", "''")
      val want = one(s"SELECT ${cdcFoldSql(s"'$lit'")}")
      val got = one(s"SELECT cdc_starts('$lit')")
      assert(got === want, s"input len=${s.length} prefix='${s.take(20)}'")
    }
    assert(one("SELECT cdc_starts(CAST(NULL AS STRING))") == null)
    // non-literal input so collect() runs the Janino-compiled doGenCode
    val df = spark.sql(
      """SELECT cdc_starts(t) AS got
        |FROM (SELECT concat('spark row batch value ',
        |             repeat(CAST(id * 37 AS STRING), 40)) AS t
        |      FROM range(8))""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"cdc_starts must not break whole-stage codegen:\n$plan")
    df.collect().foreach(r => assert(r.getSeq[Int](0).head === 1))
  }
}
