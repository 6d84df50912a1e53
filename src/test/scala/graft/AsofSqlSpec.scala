package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** `[LEFT] ASOF JOIN` in the SQL front-end (VERDICT r15 #2) — the dialect
  * door onto operators.AsofJoin's single-shuffle union+window shape.
  * Semantics pinned here: inner-vs-left row retention, inclusive `>=` vs
  * strict `>` at equal timestamps, multi-column equi keys, right-alias
  * qualifier re-pointing, and the loud-error contract for unsupported
  * shapes (an ASOF token must never fall through to Spark as an alias).
  */
class AsofSqlSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  private def mk(): Unit = {
    g.sql("DROP TABLE IF EXISTS asq_l")
    g.sql("DROP TABLE IF EXISTS asq_r")
    g.sql("CREATE TABLE asq_l(k Int64, t DateTime, lv String)")
    g.sql("CREATE TABLE asq_r(k Int64, rt DateTime, price Float64)")
    g.sql("INSERT INTO asq_l VALUES " +
      "(1, '2024-01-01 10:00:00', 'a'), " + // after r@09:00 -> 10.0
      "(1, '2024-01-01 12:00:00', 'b'), " + // == r@12:00 -> inclusive 12.0, strict 10.0
      "(2, '2024-01-01 08:00:00', 'c'), " + // before any r -> null / dropped
      "(3, '2024-01-01 09:30:00', 'd')")    // key absent in r
    g.sql("INSERT INTO asq_r VALUES " +
      "(1, '2024-01-01 09:00:00', 10.0), " +
      "(1, '2024-01-01 12:00:00', 12.0), " +
      "(2, '2024-01-01 09:00:00', 20.0)")
  }

  test("LEFT ASOF JOIN keeps unmatched left rows; >= is inclusive; the " +
    "right alias's qualifiers resolve") {
    mk()
    val rows = g.sql(
      """SELECT l.lv, r.price FROM asq_l l LEFT ASOF JOIN asq_r r
        |ON l.k = r.k AND l.t >= r.rt ORDER BY l.lv""".stripMargin)
      .collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(rows.toSeq === Seq(
      ("a", Some(10.0)), ("b", Some(12.0)), ("c", None), ("d", None)))
  }

  test("plain ASOF JOIN is INNER (CH semantics): unmatched left rows drop") {
    mk()
    val rows = g.sql(
      """SELECT lv, price FROM asq_l a ASOF JOIN asq_r b
        |ON a.k = b.k AND a.t >= b.rt ORDER BY lv""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq === Seq(("a", 10.0), ("b", 12.0)))
  }

  test("strict > excludes the same-instant right row") {
    mk()
    val rows = g.sql(
      """SELECT lv, price FROM asq_l l LEFT ASOF JOIN asq_r r
        |ON l.k = r.k AND l.t > r.rt ORDER BY lv""".stripMargin)
      .collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(rows.toSeq === Seq(
      ("a", Some(10.0)), ("b", Some(10.0)), ("c", None), ("d", None)))
  }

  test("the flipped form r.rt <= l.t normalizes; db-qualified tables and " +
    "AS aliases parse") {
    mk()
    val rows = g.sql(
      """SELECT lv, price FROM default.asq_l AS l ASOF JOIN default.asq_r AS r
        |ON l.k = r.k AND r.rt <= l.t ORDER BY lv""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq === Seq(("a", 10.0), ("b", 12.0)))
  }

  test("multi-column equi keys ride a synthetic struct key") {
    g.sql("DROP TABLE IF EXISTS asq_l2")
    g.sql("DROP TABLE IF EXISTS asq_r2")
    g.sql("CREATE TABLE asq_l2(k1 Int64, k2 String, t DateTime)")
    g.sql("CREATE TABLE asq_r2(k1 Int64, k2 String, rt DateTime, v Int64)")
    g.sql("INSERT INTO asq_l2 VALUES (1, 'x', '2024-01-01 10:00:00'), " +
      "(1, 'y', '2024-01-01 10:00:00')")
    g.sql("INSERT INTO asq_r2 VALUES (1, 'x', '2024-01-01 09:00:00', 7), " +
      "(1, 'y', '2024-01-01 09:30:00', 8), (1, 'y', '2024-01-01 11:00:00', 9)")
    val rows = g.sql(
      """SELECT a.k2, b.v FROM asq_l2 a LEFT ASOF JOIN asq_r2 b
        |ON a.k1 = b.k1 AND a.k2 = b.k2 AND a.t >= b.rt
        |ORDER BY a.k2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("x", 7L), ("y", 8L)))
  }

  test("USING form: last column is the >= inequality, the rest equalities " +
    "(CH's ASOF JOIN ... USING (k, t))") {
    g.sql("DROP TABLE IF EXISTS asq_lu")
    g.sql("DROP TABLE IF EXISTS asq_ru")
    g.sql("CREATE TABLE asq_lu(k Int64, t DateTime, lv String)")
    g.sql("CREATE TABLE asq_ru(k Int64, t DateTime, price Float64)")
    g.sql("INSERT INTO asq_lu VALUES (1, '2024-01-01 10:00:00', 'a'), " +
      "(2, '2024-01-01 08:00:00', 'b')")
    g.sql("INSERT INTO asq_ru VALUES (1, '2024-01-01 09:00:00', 10.0)")
    val rows = g.sql(
      """SELECT lv, price FROM asq_lu l LEFT ASOF JOIN asq_ru r
        |USING (k, t) ORDER BY lv""".stripMargin)
      .collect().map(x => (x.getString(0), Option(x.get(1))))
    assert(rows.toSeq === Seq(("a", Some(10.0)), ("b", None)))
    // inner USING without parens
    val inner = g.sql(
      "SELECT count() AS n FROM asq_lu l ASOF JOIN asq_ru r USING k, t")
      .collect()(0).getLong(0)
    assert(inner === 1L)
  }

  test("unsupported shapes and collisions error loudly, never fall through") {
    mk()
    // non-key right column colliding with a left column
    g.sql("DROP TABLE IF EXISTS asq_rc")
    g.sql("CREATE TABLE asq_rc(k Int64, rt DateTime, lv String)")
    val e1 = intercept[IllegalArgumentException] {
      g.sql("SELECT 1 FROM asq_l l ASOF JOIN asq_rc r " +
        "ON l.k = r.k AND l.t >= r.rt")
    }
    assert(e1.getMessage.contains("collide"))
    // no inequality
    val e2 = intercept[IllegalArgumentException] {
      g.sql("SELECT 1 FROM asq_l l ASOF JOIN asq_r r ON l.k = r.k")
    }
    assert(e2.getMessage.contains("inequality"))
    // subquery on the left side
    val e3 = intercept[IllegalArgumentException] {
      g.sql("SELECT 1 FROM (SELECT * FROM asq_l) l ASOF JOIN asq_r r " +
        "ON l.k = r.k AND l.t >= r.rt")
    }
    assert(e3.getMessage.toLowerCase.contains("asof join"))
  }

  test("forward forms: <= matches the EARLIEST right row at-or-after the " +
    "left time; < excludes the same instant") {
    mk()
    val rows = g.sql(
      """SELECT l.lv, r.price FROM asq_l l LEFT ASOF JOIN asq_r r
        |ON l.k = r.k AND l.t <= r.rt ORDER BY l.lv""".stripMargin)
      .collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(rows.toSeq === Seq(
      ("a", Some(12.0)), ("b", Some(12.0)), ("c", Some(20.0)), ("d", None)))
    val strict = g.sql(
      """SELECT l.lv, r.price FROM asq_l l LEFT ASOF JOIN asq_r r
        |ON l.k = r.k AND l.t < r.rt ORDER BY l.lv""".stripMargin)
      .collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(strict.toSeq === Seq(
      ("a", Some(12.0)), ("b", None), ("c", Some(20.0)), ("d", None)))
  }

  test("the right time column may share the left time column's name " +
    "(dropped from the output, the ON clause pins it)") {
    g.sql("DROP TABLE IF EXISTS asq_rs")
    g.sql("CREATE TABLE asq_rs(k Int64, t DateTime, price Float64)")
    g.sql("INSERT INTO asq_rs VALUES (1, '2024-01-01 09:00:00', 10.0)")
    val rows = g.sql(
      """SELECT l.lv, r.price FROM asq_l l LEFT ASOF JOIN asq_rs r
        |ON l.k = r.k AND l.t >= r.t ORDER BY l.lv""".stripMargin)
      .collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(rows.toSeq === Seq(("a", Some(10.0)), ("b", Some(10.0)),
      ("c", None), ("d", None)))
  }
}
