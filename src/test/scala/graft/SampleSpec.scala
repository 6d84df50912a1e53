package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parser.ChParser

/** ClickHouse `FROM t SAMPLE f` (d16): deterministic, repeatable,
  * NESTED sampling by multiplicative hash of the PK head — plus the
  * parser/rewriter refusal cases (row-count form, keyless table) that
  * must fail loudly rather than scan silently.
  */
class SampleSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = {
    val g = new graft.exec.GraftSession(spark)
    g.sql("DROP TABLE IF EXISTS smp_tab")
    g.sql("CREATE TABLE smp_tab(k Int64 PRIMARY KEY, v Int32)")
    g.sql("INSERT INTO smp_tab SELECT id AS k, CAST(id % 100 AS INT) AS v " +
      "FROM range(10000)")
    g
  }

  test("SAMPLE f returns a deterministic, repeatable subset of roughly " +
    "f of the rows") {
    val n1 = g.sql("SELECT count(*) AS n FROM smp_tab SAMPLE 0.3")
      .collect()(0).getLong(0)
    val n2 = g.sql("SELECT count(*) AS n FROM smp_tab SAMPLE 0.3")
      .collect()(0).getLong(0)
    assert(n1 === n2, "sampling must be repeatable")
    assert(n1 > 2000 && n1 < 4000, s"0.3 of 10000 should be ~3000, got $n1")
  }

  test("smaller fractions NEST inside larger ones (CH's sampling " +
    "contract: same hash, smaller cut)") {
    val s01 = g.sql("SELECT k FROM smp_tab SAMPLE 0.1")
      .collect().map(_.getLong(0)).toSet
    val s05 = g.sql("SELECT k FROM smp_tab SAMPLE 0.5")
      .collect().map(_.getLong(0)).toSet
    assert(s01.nonEmpty && s01.subsetOf(s05),
      s"SAMPLE 0.1 (${s01.size}) must be a subset of SAMPLE 0.5 (${s05.size})")
  }

  test("the sample filter is one pushable predicate — no extra exchange, " +
    "and WHERE composes with it") {
    val df = g.sql("SELECT count(*) AS n FROM smp_tab SAMPLE 0.5 WHERE v < 50")
    val n = df.collect()(0).getLong(0)
    val full = g.sql("SELECT count(*) AS n FROM smp_tab WHERE v < 50")
      .collect()(0).getLong(0)
    assert(n > 0 && n < full)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("row-count form and keyless tables fall through — a loud Spark " +
    "parse error, never a silent full scan") {
    // SAMPLE 1000 (row-count form): unsupported, must not be swallowed
    assertThrows[Exception] {
      g.sql("SELECT count(*) AS n FROM smp_tab SAMPLE 1000").collect()
    }
    // a table with no PRIMARY KEY has no sampling key
    g.sql("DROP TABLE IF EXISTS smp_nokey")
    g.sql("CREATE TABLE smp_nokey(a Int64)")
    try assertThrows[Exception] {
      g.sql("SELECT count(*) AS n FROM smp_nokey SAMPLE 0.5").collect()
    } finally g.sql("DROP TABLE smp_nokey")
  }

  test("parser scope: SAMPLE inside a string literal or after UNION is " +
    "not a clause") {
    assert(ChParser.splitSample("SELECT 'x SAMPLE 5' AS s FROM t").isEmpty)
    assert(ChParser.splitSample(
      "SELECT a FROM t SAMPLE 0.5 UNION ALL SELECT a FROM u").isEmpty)
  }
}
