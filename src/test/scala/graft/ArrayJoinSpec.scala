package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parser.ChParser

/** ClickHouse `[LEFT] ARRAY JOIN` (d15) — semantics the DuckDB gate's one
  * query can't fully exercise: positional zip (never Cartesian), the LEFT
  * form keeping empty-array rows, bare-column replacement scope, and the
  * parser's refusal to fire inside set operations or string literals.
  */
class ArrayJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def g = new graft.exec.GraftSession(spark)

  test("two arrays zip positionally — row count is the array length, " +
    "not the cross product") {
    val rows = g.sql(
      """SELECT id, a, b FROM (
        |  SELECT 1 AS id, array('x', 'y', 'z') AS xs,
        |         array(10, 20, 30) AS ys
        |) t ARRAY JOIN xs AS a, ys AS b ORDER BY b""".stripMargin).collect()
    assert(rows.length === 3, "zip, not a 3x3 Cartesian")
    assert(rows.map(r => (r.getString(1), r.getInt(2))).toSeq ===
      Seq(("x", 10), ("y", 20), ("z", 30)))
  }

  test("inner ARRAY JOIN drops empty-array rows; LEFT keeps them with " +
    "NULL elements") {
    val src = """SELECT 1 AS id, array(7, 8) AS xs
                |UNION ALL SELECT 2 AS id, array() AS xs""".stripMargin
    val inner = g.sql(
      s"SELECT id, x FROM ($src) t ARRAY JOIN xs AS x").collect()
    assert(inner.map(_.getInt(0)).toSet === Set(1))
    val left = g.sql(
      s"SELECT id, x FROM ($src) t LEFT ARRAY JOIN xs AS x ORDER BY id")
      .collect()
    assert(left.length === 3)
    assert(left.filter(_.getInt(0) == 2).forall(_.isNullAt(1)),
      "LEFT keeps id=2 with a NULL element")
  }

  test("bare column is REPLACED in scope by its element (CH semantics)") {
    val rows = g.sql(
      """SELECT id, xs FROM (
        |  SELECT 5 AS id, array(1, 2, 3) AS xs
        |) t ARRAY JOIN xs ORDER BY xs""".stripMargin).collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(1, 2, 3),
      "xs downstream of ARRAY JOIN xs must be the ELEMENT, not the array")
  }

  test("WHERE filters AFTER expansion (CH clause order)") {
    val rows = g.sql(
      """SELECT x FROM (SELECT array(1, 2, 3, 4) AS xs) t
        |ARRAY JOIN xs AS x WHERE x % 2 = 0 ORDER BY x""".stripMargin)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(2, 4))
  }

  test("parser scope: set operations and string literals never trigger " +
    "the rewrite; un-aliased expressions are left for Spark to reject") {
    assert(ChParser.splitArrayJoin(
      "SELECT 1 UNION ALL SELECT x FROM t ARRAY JOIN xs AS x").isEmpty,
      "set operations are out of scope")
    assert(ChParser.splitArrayJoin(
      "SELECT 'ARRAY JOIN xs AS x' AS s FROM t").isEmpty,
      "the clause inside a string literal is not a clause")
    assert(ChParser.splitArrayJoin(
      "SELECT y FROM t ARRAY JOIN slice(xs, 1, 2)").isEmpty,
      "a non-trivial item with nothing to name it by does not rewrite")
    val p = ChParser.splitArrayJoin(
      "SELECT a FROM t LEFT ARRAY JOIN xs AS a WHERE a > 0").get
    assert(p.left && p.items.map(_.alias) === Seq("a") &&
      p.tail.trim.startsWith("WHERE"))
  }

  test("tokens after an alias (e.g. a trailing JOIN clause) make the " +
    "item invalid — never silently dropped (ADVICE r13)") {
    assert(ChParser.splitArrayJoin(
      "SELECT a FROM t ARRAY JOIN xs AS a JOIN u ON u.k = t.k").isEmpty,
      "an item whose alias is not its final token must not rewrite")
    assert(ChParser.splitArrayJoin(
      "SELECT a, b FROM t ARRAY JOIN xs AS a extra, ys AS b").isEmpty,
      "trailing tokens in ANY item poison the whole clause")
  }

  test("single-column source with a bare item: the rewrite must not " +
    "emit an empty `* EXCEPT` (ADVICE r13)") {
    val rows = g.sql(
      """SELECT xs FROM (SELECT array(4, 5) AS xs) t
        |ARRAY JOIN xs ORDER BY xs""".stripMargin).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(4, 5))
  }

  test("an AS alias colliding with a source column replaces it in scope " +
    "(CH semantics), not an ambiguous duplicate (ADVICE r13)") {
    val rows = g.sql(
      """SELECT id, y FROM (
        |  SELECT 1 AS id, 99 AS y, array(6, 7) AS xs
        |) t ARRAY JOIN xs AS y ORDER BY y""".stripMargin).collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(6, 7),
      "y downstream must be the exploded element, not the shadowed column")
  }
}
