package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** CH table functions file() and merge() (VERDICT r16 task #5): file()
  * reads under a CONFINED data root (traversal out rejected), formats and
  * the CH-DDL structure arg work; merge() unions the catalog tables
  * matching a regexp at QUERY time with the virtual _table column — and a
  * view over merge() picks up tables created AFTER the view (the
  * pattern-refresh contract).
  */
class TableFnSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  private def withRoot[T](f: java.nio.file.Path => T): T = {
    val root = java.nio.file.Files.createTempDirectory("graft_filefn")
    val prev = spark.conf.getOption("spark.graft.fileRoot")
    spark.conf.set("spark.graft.fileRoot", root.toString)
    try f(root)
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.fileRoot", v)
      case None => spark.conf.unset("spark.graft.fileRoot")
    }
  }

  test("file(): headerless CSV gets CH's c1..cn names; WithNames and the " +
    "structure arg type the columns; JSONEachRow reads") {
    withRoot { root =>
      java.nio.file.Files.writeString(root.resolve("plain.csv"),
        "1,aa\n2,bb\n3,aa\n")
      val plain = g.sql(
        "SELECT c2, count(*) AS n FROM file('plain.csv', 'CSV') " +
        "GROUP BY c2 ORDER BY c2")
      assert(plain.columns.toSeq === Seq("c2", "n"))
      assert(plain.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        === Seq(("aa", 2L), ("bb", 1L)))

      java.nio.file.Files.writeString(root.resolve("named.csv"),
        "k,v\n10,1.5\n20,2.5\n")
      val named = g.sql("SELECT k, v FROM file('named.csv', 'CSVWithNames', " +
        "'k Int64, v Float64') ORDER BY k")
      assert(named.schema.map(_.dataType.typeName).toSeq ===
        Seq("long", "double"))
      assert(named.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        === Seq((10L, 1.5), (20L, 2.5)))

      java.nio.file.Files.writeString(root.resolve("rows.jsonl"),
        """{"a": 1, "b": "x"}""" + "\n" + """{"a": 2, "b": "y"}""" + "\n")
      val js = g.sql("SELECT a, b FROM file('rows.jsonl', 'JSONEachRow', " +
        "'a Int64, b String') ORDER BY a")
      assert(js.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((1L, "x"), (2L, "y")))
    }
  }

  test("file(): path traversal out of the data root and unknown formats " +
    "are rejected") {
    withRoot { root =>
      java.nio.file.Files.writeString(root.resolve("x.csv"), "1\n")
      val e1 = intercept[Exception] {
        g.sql("SELECT * FROM file('../../../etc/passwd', 'CSV')") }
      assert(e1.getMessage.contains("escapes the data root"), e1.getMessage)
      val e2 = intercept[Exception] {
        g.sql("SELECT * FROM file('nope.csv', 'CSV')") }
      assert(e2.getMessage.contains("no such file"), e2.getMessage)
      val e3 = intercept[Exception] {
        g.sql("SELECT * FROM file('x.csv', 'Arrow')") }
      assert(e3.getMessage.contains("unsupported format"), e3.getMessage)
    }
  }

  test("INSERT INTO FUNCTION file() writes under the root; file() reads " +
    "it back; a second INSERT appends (CH text-format contract); " +
    "traversal out is rejected") {
    withRoot { root =>
      g.sql("INSERT INTO FUNCTION file('out/export.csv', 'CSVWithNames') " +
        "SELECT 1 AS k, 'a' AS s")
      assert(java.nio.file.Files.exists(root.resolve("out/export.csv")))
      val r1 = g.sql("SELECT k, s FROM file('out/export.csv', " +
        "'CSVWithNames', 'k Int64, s String') ORDER BY k")
      assert(r1.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((1L, "a")))
      // append: headerless so the appended rows don't re-emit a header
      g.sql("INSERT INTO FUNCTION file('out/plain.csv', 'CSV') " +
        "SELECT 1 AS k UNION ALL SELECT 2 AS k")
      g.sql("INSERT INTO FUNCTION file('out/plain.csv', 'CSV') " +
        "SELECT 3 AS k")
      val r2 = g.sql("SELECT c1 FROM file('out/plain.csv', 'CSV', " +
        "'c1 Int64') ORDER BY c1")
      assert(r2.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
      val e = intercept[Exception] {
        g.sql("INSERT INTO FUNCTION file('../evil.csv', 'CSV') SELECT 1") }
      assert(e.getMessage.contains("escapes the data root"), e.getMessage)
    }
  }

  test("merge() unions matching tables; _table appears only when asked; " +
    "a view over merge() sees tables created AFTER the view") {
    g.sql("DROP VIEW IF EXISTS tfn_view")
    g.sql("DROP TABLE IF EXISTS tfn_m1; DROP TABLE IF EXISTS tfn_m2; " +
      "DROP TABLE IF EXISTS tfn_other; DROP TABLE IF EXISTS tfn_m3")
    g.sql("CREATE TABLE tfn_m1(k Int64)"); g.sql("INSERT INTO tfn_m1 VALUES (1), (2)")
    g.sql("CREATE TABLE tfn_m2(k Int64)"); g.sql("INSERT INTO tfn_m2 VALUES (3)")
    g.sql("CREATE TABLE tfn_other(k Int64)")
    g.sql("INSERT INTO tfn_other VALUES (99)")

    // SELECT * carries NO _table (CH virtual-column contract)
    val star = g.sql("SELECT * FROM merge('default', '^tfn_m')")
    assert(star.columns.toSeq === Seq("k"))
    assert(star.count() === 3L)
    // asked for, _table labels each row's source table
    val lab = g.sql("SELECT _table, count(*) AS n " +
      "FROM merge('default', '^tfn_m') GROUP BY _table ORDER BY _table")
    assert(lab.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("tfn_m1", 2L), ("tfn_m2", 1L)))

    // pattern refresh: a view over merge() re-matches at query time
    g.sql("CREATE VIEW tfn_view AS SELECT count(*) AS n " +
      "FROM merge('default', '^tfn_m')")
    assert(g.sql("SELECT n FROM tfn_view").head().getLong(0) === 3L)
    g.sql("CREATE TABLE tfn_m3(k Int64)")
    g.sql("INSERT INTO tfn_m3 VALUES (7), (8)")
    assert(g.sql("SELECT n FROM tfn_view").head().getLong(0) === 5L,
      "a table created AFTER the view must join the union at query time")

    val e = intercept[Exception] {
      g.sql("SELECT * FROM merge('default', '^tfn_nomatch_')") }
    assert(e.getMessage.contains("no tables"), e.getMessage)

    g.sql("DROP VIEW tfn_view")
    g.sql("DROP TABLE tfn_m1; DROP TABLE tfn_m2; DROP TABLE tfn_m3; " +
      "DROP TABLE tfn_other")
  }

  test("generateRandom: same seed -> identical rows across runs; " +
    "different seed -> different stream; bounds honored") {
    val q = "SELECT * FROM generateRandom(" +
      "'a Int64, u UInt32, f Float64, s String, d Date, " +
      "e Enum8(''x'' = 1, ''y'' = 2), " +
      "nn Nullable(Int32), arr Array(Int16)', 7, 12, 3) LIMIT 200"
    val r1 = g.sql(q).collect()
    val r2 = g.sql(q).collect()
    assert(r1.length === 200)
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq,
      "same-seed runs must agree exactly")
    val other = g.sql(q.replace(", 7, 12, 3)", ", 8, 12, 3)")).collect()
    assert(r1.map(_.toString).toSeq !== other.map(_.toString).toSeq,
      "a different seed must change the stream")
    r1.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
      assert(r.getString(3).length >= 1 && r.getString(3).length <= 12)
      assert(Set("x", "y").contains(r.getString(5)))
      assert(r.getSeq[Short](7).length <= 3)
    }
    // UInt32 widens to BIGINT, never negative
    assert(r1.forall(r => r.getLong(1) >= 0L))
    // nullable column actually produces some NULLs and some values
    assert(r1.exists(_.isNullAt(6)) && r1.exists(!_.isNullAt(6)))
    // unsupported inner types fail loudly, not silently
    val e = intercept[Exception] {
      g.sql("SELECT * FROM generateRandom('m Map(String, Int64)') LIMIT 1") }
    assert(e.getMessage.contains("unsupported type"), e.getMessage)
  }
}
