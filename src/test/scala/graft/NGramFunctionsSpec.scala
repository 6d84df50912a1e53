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

  test("minhash_sigs equals the exploded word_ngrams + min pipeline") {
    // The l02/l02b Spark plans now compute signatures inside the scan —
    // this equality (over the whole fixture corpus AND adversarial edge
    // texts) is the bridge that keeps them matching the DuckDB oracle,
    // which still runs the exploded pipeline.
    Tables.registerAll(spark, SparkTestSession.sf)
    import spark.implicits._
    Seq((900L, "a  b c"), (901L, " x y z "), (902L, "héllo wörld tokens"),
        (903L, "t1 t2 t3 t4 t5"), (904L, "a b c"))
      .toDF("doc_id", "text").createOrReplaceTempView("mh_edge")
    Seq("documents", "mh_edge").foreach { table =>
      val hs = (0 until 4).map(i =>
        s"min(substr(md5(concat(s, '#$i')), 1, 8)) AS h$i").mkString(", ")
      val sql = spark.sql(
        s"""SELECT doc_id, $hs FROM (
           |  SELECT doc_id, explode(word_ngrams(text, 3)) AS s
           |  FROM $table WHERE size(split(text, ' ')) >= 3)
           |GROUP BY doc_id""".stripMargin)
      val expr = spark.sql(
        s"""SELECT doc_id, hs[0] AS h0, hs[1] AS h1, hs[2] AS h2, hs[3] AS h3
           |FROM (SELECT doc_id, minhash_sigs(text, 3, 4) AS hs FROM $table
           |      WHERE size(split(text, ' ')) >= 3)""".stripMargin)
      assert(expr.count() === sql.count(), table)
      assert(expr.exceptAll(sql).isEmpty && sql.exceptAll(expr).isEmpty, table)
    }
  }

  test("ngram_rep_stats equals the exploded (doc, gram) aggregation") {
    Tables.registerAll(spark, SparkTestSession.sf)
    import spark.implicits._
    // includes the adversarial case the filter exists for: one gram
    // repeated thousands of times (the rejected HOF form went quadratic
    // here; the hash-map expression must stay linear AND exact)
    Seq((950L, Array.fill(5000)("spam").mkString(" ")),
        (951L, "a b a b a c"), (952L, "x  y  x"), (953L, "t1 t2"))
      .toDF("doc_id", "text").createOrReplaceTempView("rep_edge")
    Seq("documents", "rep_edge").foreach { table =>
      val sql = spark.sql(
        s"""SELECT doc_id, max(c) AS top_c, sum(c) AS n_bg FROM (
           |  SELECT doc_id, g, count(*) AS c
           |  FROM $table LATERAL VIEW explode(word_ngrams(text, 2)) t AS g
           |  WHERE size(split(text, ' ')) >= 2
           |  GROUP BY doc_id, g) u
           |GROUP BY doc_id""".stripMargin)
      val expr = spark.sql(
        s"""SELECT doc_id, st.top_c AS top_c, st.n_bg AS n_bg
           |FROM (SELECT doc_id, ngram_rep_stats(text, 2) AS st FROM $table
           |      WHERE size(split(text, ' ')) >= 2)""".stripMargin)
      assert(expr.count() === sql.count(), table)
      assert(expr.exceptAll(sql).isEmpty && sql.exceptAll(expr).isEmpty, table)
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
