package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{GraftSession, SqlScript}
import graft.exec.SqlScript.Stmt

/** The reference's OWN test corpus, run VERBATIM (byte-for-byte files from
  * /root/reference) through GraftSession:
  *
  *  - `crates/tests_integ/sql_test_scripts/basic_checks.sql` under the
  *    reference's blank-line runner semantics, `:N` scalar verified.
  *  - `crates/tests_integ/tpch/tpch_stress.sql` (BaseStorage DDL with
  *    PARTITION BY toYYYYMM + LowCardinality columns).
  *  - `crates/tests_integ/tpch/01095_tpch_like_smoke.sql`: the full CH
  *    TPC-H DDL (CONSTRAINT…CHECK, FixedString, Decimal(18,2), MergeTree
  *    ORDER BY) plus its 22 queries. The file's own expectations:
  *      - 14 queries live unmarked (the reference's 14/22 pass set),
  *      - 5 marked `-- {{ serverError }}` (q2/q17/q20 valid-but-correlated
  *        — DataFusion-6 can't plan them; q13/q15 invalid AS WRITTEN — the
  *        file dropped the `as c_count` / `(supplier_no, total_revenue)`
  *        aliases, so EVERY engine must reject them),
  *      - 3 fully commented out (q4/q21/q22, [NOT] EXISTS).
  *    This engine: all 14 parity queries pass, q2/q17/q20 pass (upgrade),
  *    q13/q15 fail-as-the-file-expects, and the resurrected q4/q21/q22
  *    pass → 20/22 runnable, 22/22 behave as-expected-or-better.
  *
  * Writes CONFORMANCE.md with the per-query ledger.
  */
class RefConformanceSpec extends AnyFunSuite {

  private val refRoot = "/root/reference/crates/tests_integ"

  // isolated session: its own current database, shared warehouse
  private lazy val g = {
    val s = SparkTestSession.spark.newSession()
    val gs = new GraftSession(s)
    gs.sql("CREATE DATABASE IF NOT EXISTS ref_conf")
    gs.sql("USE ref_conf")
    gs
  }

  private def read(rel: String): String =
    new String(Files.readAllBytes(Paths.get(refRoot, rel)), "UTF-8")

  test("basic_checks.sql runs verbatim; the :6 scalar holds") {
    val stmts = SqlScript.splitBlankLine(read("sql_test_scripts/basic_checks.sql"))
    assert(stmts.length === 4)
    stmts.foreach { st =>
      val df = g.sql(st.sql)
      st.expectScalar.foreach { want =>
        val got = BigDecimal(df.collect()(0).get(0).toString).toLong
        assert(got === want, s"scalar mismatch for: ${st.sql}")
      }
    }
    assert(stmts.last.expectScalar === Some(6L))
  }

  test("tpch_stress.sql runs verbatim (BaseStorage + toYYYYMM partition + " +
    "LowCardinality DDL)") {
    val stmts = SqlScript.splitBlankLine(read("tpch/tpch_stress.sql"))
    assert(stmts.length === 3)
    stmts.foreach(st => g.sql(st.sql))
  }

  test("01095_tpch_like_smoke.sql runs verbatim: 14/14 reference-parity " +
    "queries pass, q2/q17/q20 upgrade to pass, q13/q15 fail as the file " +
    "expects, resurrected q4/q21/q22 pass") {
    val text = read("tpch/01095_tpch_like_smoke.sql")
    val stmts = SqlScript.splitSemicolon(text)
    val marker = """(?is)^select\s+(\d+)\s*(,.*)?$""".r

    // the three fully-commented-out queries ([NOT] EXISTS): q4, q21, q22 —
    // resurrected and run in place (at their marker, while the tables the
    // file later DROPs still exist)
    val disabled = SqlScript.disabledStatements(text)
    assert(disabled.length === 3, s"expected 3 disabled queries, got " +
      s"${disabled.length}")
    val disabledAt = Iterator(4, 21, 22).zip(disabled.iterator).toMap

    var qnum = 0
    val failed = scala.collection.mutable.Map.empty[Int, String]
    val markedPassed = scala.collection.mutable.Set.empty[Int]
    val markedFailed = scala.collection.mutable.Set.empty[Int]
    val seen = scala.collection.mutable.Set.empty[Int]

    stmts.foreach { case Stmt(sql, expErr, _) =>
      sql match {
        case marker(n, _) =>
          qnum = n.toInt; seen += qnum
          g.sql(sql).collect() // the marker row itself must evaluate
          disabledAt.get(qnum).foreach(dq => g.sql(dq).collect())
        case _ =>
          val r = scala.util.Try { g.sql(sql).collect() }
          (r.isSuccess, expErr) match {
            case (true, true)  => markedPassed += qnum
            case (false, true) => markedFailed += qnum
            case (false, _) =>
              failed(qnum) = r.failed.get.getMessage.take(200)
            case _ => ()
          }
      }
    }

    assert(seen === (1 to 22).toSet, s"query markers seen: $seen")
    assert(failed.isEmpty,
      s"unmarked statements failed: ${failed.toSeq.sortBy(_._1)}")
    assert(markedPassed.toSet === Set(2, 17, 20),
      "correlated-subquery queries the reference rejects must pass here")
    assert(markedFailed.toSet === Set(13, 15),
      "q13/q15 are invalid as written (missing aliases) — must error")

    val parity = (1 to 22).toSet -- Set(2, 4, 13, 15, 17, 20, 21, 22)
    val lines = (1 to 22).map { q =>
      val (status, note) =
        if (parity(q)) ("pass", "reference passes too (its 14/22 set)")
        else if (Set(2, 17, 20)(q)) ("pass", "reference: serverError 47 " +
          "(DataFusion-6 cannot plan the correlated subquery) — upgraded")
        else if (Set(4, 21, 22)(q)) ("pass", "shipped commented out in the " +
          "file ([NOT] EXISTS unsupported there) — resurrected, passes")
        else ("expected-error", "invalid as written (missing alias) — the " +
          "file marks serverError; this engine rejects it too")
      f"| q$q%-3d | $status%-14s | $note |"
    }
    val md =
      s"""# CONFORMANCE — the reference's own test corpus, run verbatim
         |
         |Generated by `RefConformanceSpec` (sbt test). Files read
         |byte-for-byte from `/root/reference/crates/tests_integ/`; executed
         |through `GraftSession` in database `ref_conf`.
         |
         |## sql_test_scripts/basic_checks.sql
         |4/4 statements pass under the reference's blank-line runner
         |semantics; the `:6` expected scalar verified. (The reference's own
         |runner loop drops the final block — sql_test_runner.rs:72-84 — so
         |it never actually checks the `:6`; this port runs it.)
         |
         |## tpch/tpch_stress.sql
         |3/3 statements pass (BaseStorage engine, PARTITION BY
         |toYYYYMM(l_shipdate), LowCardinality(String) columns).
         |
         |## tpch/01095_tpch_like_smoke.sql
         |DDL: 8 DROP + 8 CREATE TABLE (CONSTRAINT…CHECK, FixedString,
         |Decimal(18,2), MergeTree ORDER BY) + 8 final DROP — all pass, and
         |the CHECK constraints are ENFORCED on insert (ConstraintSpec).
         |
         |Queries: **20/22 run and pass** (reference: 14/22); the other 2
         |(q13, q15) are invalid as written in the file — it dropped the
         |`as c_count` / `(supplier_no, total_revenue)` aliases and marks
         |them `serverError` — and this engine rejects them too, matching
         |the file's expectation. 22/22 behave as-expected-or-better.
         |
         || query | here | note |
         ||---|---|---|
         |${lines.mkString("\n")}
         |""".stripMargin
    Files.write(Paths.get("/root/repo/CONFORMANCE.md"),
      md.getBytes("UTF-8"))
  }
}
