package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** CONSTRAINT … CHECK — parsed from the CH DDL the reference's own smoke
  * file writes (crates/tests_integ/tpch/01095_tpch_like_smoke.sql:21-22)
  * and ENFORCED at insert time, ClickHouse's semantics: a false row aborts
  * the INSERT, a NULL check passes (SQL), and every insert path (VALUES,
  * SELECT, FORMAT) goes through the same guard.
  */
class ConstraintSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  private def mk(): Unit = {
    g.sql("DROP TABLE IF EXISTS chk_t")
    g.sql("""CREATE TABLE chk_t (
      a Int32,
      b Nullable(Int64),
      CONSTRAINT pos CHECK a >= 0,
      CONSTRAINT rel CHECK (b IS NULL OR b > a)
    ) engine = MergeTree ORDER BY (a)""")
  }

  test("valid rows insert; a violating row aborts with the constraint name") {
    mk()
    g.sql("INSERT INTO chk_t VALUES (1, 10), (2, NULL)")
    assert(g.sql("SELECT count() AS n FROM chk_t").collect()(0).getLong(0) === 2L)
    val e = intercept[Exception] { g.sql("INSERT INTO chk_t VALUES (-1, 5)") }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(e).contains("CHECK constraint"))
    // the failed insert landed nothing
    assert(g.sql("SELECT count() AS n FROM chk_t").collect()(0).getLong(0) === 2L)
  }

  test("the relational constraint fires; NULL passes (SQL semantics)") {
    mk()
    g.sql("INSERT INTO chk_t VALUES (5, NULL)") // NULL check → passes
    intercept[Exception] { g.sql("INSERT INTO chk_t VALUES (5, 3)") } // b <= a
    assert(g.sql("SELECT count() AS n FROM chk_t").collect()(0).getLong(0) === 1L)
  }

  test("INSERT ... SELECT is guarded too; constraints survive SHOW CREATE " +
    "replay") {
    mk()
    g.sql("INSERT INTO chk_t VALUES (1, 2)")
    intercept[Exception] {
      g.sql("INSERT INTO chk_t SELECT -a, b FROM chk_t")
    }
    val script = g.sql("SHOW CREATE TABLE chk_t").collect()(0).getString(0)
    assert(script.toLowerCase.contains("constraint"))
  }
}
