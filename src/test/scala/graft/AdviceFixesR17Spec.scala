package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession
import graft.server.MysqlProto

/** Pins the five ADVICE r17 fixes. */
class AdviceFixesR17Spec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  test("file() append with CSVWithNames strips the part's header row") {
    val root = java.nio.file.Paths.get(
      spark.conf.getOption("spark.graft.fileRoot")
        .getOrElse("/tmp/graft_user_files"))
    java.nio.file.Files.createDirectories(root)
    val rel = "advice_r17_append.csv"
    java.nio.file.Files.deleteIfExists(root.resolve(rel))
    g.sql(s"INSERT INTO FUNCTION file('$rel', 'CSVWithNames') " +
      "SELECT 1 AS a, 'x' AS b")
    g.sql(s"INSERT INTO FUNCTION file('$rel', 'CSVWithNames') " +
      "SELECT 2 AS a, 'y' AS b")
    val lines = java.nio.file.Files.readAllLines(root.resolve(rel))
    // exactly ONE header line, then the two data waves — a mid-file
    // header would read back as a data row
    assert(lines.size === 3, lines)
    assert(lines.get(0) === "a,b")
    val back = g.sql(s"SELECT CAST(a AS INT) AS a, b FROM " +
      s"file('$rel', 'CSVWithNames') ORDER BY a").collect()
    assert(back.map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((1, "x"), (2, "y")))
    java.nio.file.Files.deleteIfExists(root.resolve(rel))
  }

  test("file() refuses to overwrite an existing parquet file") {
    val root = java.nio.file.Paths.get(
      spark.conf.getOption("spark.graft.fileRoot")
        .getOrElse("/tmp/graft_user_files"))
    java.nio.file.Files.createDirectories(root)
    val rel = "advice_r17_pq.parquet"
    java.nio.file.Files.deleteIfExists(root.resolve(rel))
    g.sql(s"INSERT INTO FUNCTION file('$rel', 'Parquet') SELECT 1 AS a")
    val e = intercept[Exception] {
      g.sql(s"INSERT INTO FUNCTION file('$rel', 'Parquet') SELECT 2 AS a")
    }
    assert(e.getMessage.contains("cannot be appended"))
    // the original file is untouched
    val back = g.sql(s"SELECT a FROM file('$rel', 'Parquet')").collect()
    assert(back.map(_.getInt(0)).toSeq === Seq(1))
    java.nio.file.Files.deleteIfExists(root.resolve(rel))
  }

  test("CREATE MATERIALIZED VIEW TO rejects a duplicate name instead of " +
    "silently repointing (old target would keep receiving fanout)") {
    // suites run in PARALLEL on the shared session: these tests live in
    // their OWN database with every name qualified, so a concurrent
    // suite's USE / catalog churn cannot re-point resolution
    g.sql("CREATE DATABASE IF NOT EXISTS adv17")
    g.sql("DROP TABLE IF EXISTS adv17.amv_t1; " +
      "DROP TABLE IF EXISTS adv17.amv_t2; " +
      "DROP TABLE IF EXISTS adv17.amv_src")
    g.sql("DROP VIEW IF EXISTS adv17.amv_v")
    g.sql("CREATE TABLE adv17.amv_src(a Int64)")
    g.sql("CREATE TABLE adv17.amv_t1(a Int64)")
    g.sql("CREATE TABLE adv17.amv_t2(a Int64)")
    g.sql("CREATE MATERIALIZED VIEW adv17.amv_v TO adv17.amv_t1 AS " +
      "SELECT a FROM adv17.amv_src")
    val e = intercept[Exception] {
      g.sql("CREATE MATERIALIZED VIEW adv17.amv_v TO adv17.amv_t2 AS " +
        "SELECT a FROM adv17.amv_src")
    }
    assert(e.getMessage.contains("already exists"))
    // IF NOT EXISTS stays a no-op; fanout still reaches ONLY t1
    g.sql("CREATE MATERIALIZED VIEW IF NOT EXISTS adv17.amv_v " +
      "TO adv17.amv_t2 AS SELECT a FROM adv17.amv_src")
    g.sql("INSERT INTO adv17.amv_src VALUES (7)")
    assert(g.sql("SELECT count() AS n FROM adv17.amv_t1")
      .collect()(0).getLong(0) === 1L)
    assert(g.sql("SELECT count() AS n FROM adv17.amv_t2")
      .collect()(0).getLong(0) === 0L)
  }

  test("splitOnPlaceholders skips '?' inside '#' and '/* */' comments") {
    assert(MysqlProto.splitOnPlaceholders(
      "SELECT ? # is this a ?\n, ?").length === 3) // 2 markers -> 3 parts
    assert(MysqlProto.splitOnPlaceholders(
      "SELECT /* a ? in a block */ ?, ?").length === 3)
    assert(MysqlProto.splitOnPlaceholders(
      "SELECT '?' /* ? */ -- ?\n").length === 1) // no real markers
    // unterminated block comment swallows to EOL without a crash
    assert(MysqlProto.splitOnPlaceholders("SELECT 1 /* ?").length === 1)
  }

  test("non-finite FLOAT/DOUBLE binary params render as CAST literals") {
    def dbl(v: Double): MysqlProto.In = {
      val bits = java.lang.Double.doubleToLongBits(v)
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(bits).array()
      new MysqlProto.In(b)
    }
    def flt(v: Float): MysqlProto.In = {
      val bits = java.lang.Float.floatToIntBits(v)
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(bits).array()
      new MysqlProto.In(b)
    }
    assert(MysqlProto.decodeBinaryParam(dbl(Double.NaN), 0x05) ===
      "CAST('NaN' AS DOUBLE)")
    assert(MysqlProto.decodeBinaryParam(dbl(Double.PositiveInfinity), 0x05) ===
      "CAST('Infinity' AS DOUBLE)")
    assert(MysqlProto.decodeBinaryParam(dbl(Double.NegativeInfinity), 0x05) ===
      "CAST('-Infinity' AS DOUBLE)")
    assert(MysqlProto.decodeBinaryParam(dbl(1.25), 0x05) === "1.25")
    assert(MysqlProto.decodeBinaryParam(flt(Float.NaN), 0x04) ===
      "CAST('NaN' AS DOUBLE)")
    assert(MysqlProto.decodeBinaryParam(flt(0.1f), 0x04) === "0.1")
    // the rendered literal parses and evaluates
    val r = spark.sql("SELECT CAST('NaN' AS DOUBLE) AS v").collect()(0)
    assert(java.lang.Double.isNaN(r.getDouble(0)))
  }

  test("merge() unions only TABLES (views excluded) and _table inside a " +
    "string literal is not a reference") {
    g.sql("CREATE DATABASE IF NOT EXISTS adv17")
    g.sql("DROP TABLE IF EXISTS adv17.amg_a1; " +
      "DROP TABLE IF EXISTS adv17.amg_a2")
    g.sql("DROP VIEW IF EXISTS adv17.amg_a3")
    g.sql("CREATE TABLE adv17.amg_a1(x Int64)")
    g.sql("CREATE TABLE adv17.amg_a2(x Int64)")
    g.sql("INSERT INTO adv17.amg_a1 VALUES (1)")
    g.sql("INSERT INTO adv17.amg_a2 VALUES (2)")
    // a persistent VIEW matching the pattern must NOT join the union
    // (it reads amg_a1 — including it would double-count)
    g.sql("CREATE VIEW adv17.amg_a3 AS SELECT x FROM adv17.amg_a1")
    val db = "adv17"
    val n = g.sql(s"SELECT count() AS n FROM merge('$db', '^amg_a')")
      .collect()(0).getLong(0)
    assert(n === 2L)
    // '_table' inside a string literal only: the virtual column must not
    // be spliced into the branches (SELECT * would surface it)
    val cols = g.sql(
      s"SELECT *, 'about _table' AS note FROM merge('$db', '^amg_a')")
      .columns.toSeq
    assert(cols === Seq("x", "note"))
    // as a real identifier it IS available
    val withT = g.sql(s"SELECT _table, x FROM merge('$db', '^amg_a') " +
      "ORDER BY x").collect()
    assert(withT.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("amg_a1", 1L), ("amg_a2", 2L)))
  }
}
