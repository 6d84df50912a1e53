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

  test("SAMPLE f OFFSET o windows PARTITION the table: 0.5 / 0.5 OFFSET " +
    "0.5 are disjoint and their union is the full table") {
    val a = g.sql("SELECT k FROM smp_tab SAMPLE 0.5")
      .collect().map(_.getLong(0)).toSet
    val b = g.sql("SELECT k FROM smp_tab SAMPLE 0.5 OFFSET 0.5")
      .collect().map(_.getLong(0)).toSet
    assert(a.nonEmpty && b.nonEmpty)
    assert((a & b).isEmpty, s"windows must be disjoint (${(a & b).size} shared)")
    assert(a.size + b.size === 10000,
      s"union must be exhaustive: ${a.size} + ${b.size}")
    // and four quarter-windows tile it too
    val quarters = (0 until 4).map { i =>
      g.sql(s"SELECT k FROM smp_tab SAMPLE 0.25 OFFSET 0.${25 * i}"
        .replace("OFFSET 0.0", "OFFSET 0")).collect().map(_.getLong(0)).toSet
    }
    assert(quarters.map(_.size).sum === 10000)
    assert(quarters.reduce(_ ++ _).size === 10000)
  }

  test("OFFSET preserves nesting against the unshifted window: SAMPLE " +
    "0.25 is the prefix half of SAMPLE 0.5") {
    val q = g.sql("SELECT k FROM smp_tab SAMPLE 0.25")
      .collect().map(_.getLong(0)).toSet
    val h = g.sql("SELECT k FROM smp_tab SAMPLE 0.5")
      .collect().map(_.getLong(0)).toSet
    val shifted = g.sql("SELECT k FROM smp_tab SAMPLE 0.25 OFFSET 0.25")
      .collect().map(_.getLong(0)).toSet
    assert(q.subsetOf(h) && shifted.subsetOf(h) && (q ++ shifted) === h)
  }

  test("the hash window is sign-safe: NEGATIVE sampling keys still " +
    "partition across OFFSET windows") {
    g.sql("DROP TABLE IF EXISTS smp_neg")
    g.sql("CREATE TABLE smp_neg(k Int64 PRIMARY KEY)")
    g.sql("INSERT INTO smp_neg SELECT id - 2000 AS k FROM range(4000)")
    try {
      val a = g.sql("SELECT k FROM smp_neg SAMPLE 0.5")
        .collect().map(_.getLong(0)).toSet
      val b = g.sql("SELECT k FROM smp_neg SAMPLE 0.5 OFFSET 0.5")
        .collect().map(_.getLong(0)).toSet
      // the r14 hash sent every negative key to window 0 and none to any
      // OFFSET window; both windows must see a real share of them
      assert(a.exists(_ < 0) && b.exists(_ < 0),
        "negative keys must land in both windows")
      assert((a & b).isEmpty && a.size + b.size === 4000)
    } finally g.sql("DROP TABLE smp_neg")
  }

  test("an OFFSET window escaping [0, 1] falls through — loud error, " +
    "never a silently-wrong cut") {
    // o + f > 1
    assertThrows[Exception] {
      g.sql("SELECT count(*) AS n FROM smp_tab SAMPLE 0.5 OFFSET 0.8").collect()
    }
    // o >= 1 outright
    assertThrows[Exception] {
      g.sql("SELECT count(*) AS n FROM smp_tab SAMPLE 0.5 OFFSET 1.5").collect()
    }
    // OFFSET with no usable number is not a sample clause either
    assertThrows[Exception] {
      g.sql("SELECT count(*) AS n FROM smp_tab SAMPLE OFFSET 0.5").collect()
    }
  }
}
