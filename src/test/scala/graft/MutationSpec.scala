package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** ClickHouse mutations: `ALTER TABLE t DELETE WHERE`, `ALTER TABLE t
  * UPDATE … WHERE`, and the lightweight `DELETE FROM t WHERE`. The
  * engine rewrites ONLY the files containing a matching row (the
  * 100 TB contract — a selective mutation touches the matched fraction,
  * not the table), evaluates assignment RHSs against the PRE-mutation
  * row, leaves non-TRUE (false or NULL) condition rows alone, and
  * commits through the same crash-safe intent/replay protocol as
  * OPTIMIZE.
  */
class MutationSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  private def tableLoc(table: String): java.nio.file.Path =
    java.nio.file.Paths.get(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table, Some("default"))
      ).location.toString).getPath)

  private def listParquet(d: java.nio.file.Path): Vector[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator.asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toVector
    } finally s.close()
  }

  test("ALTER TABLE ... DELETE WHERE removes matching rows; a NULL " +
    "condition keeps the row (non-TRUE is not a match)") {
    g.sql("DROP TABLE IF EXISTS mut_d")
    g.sql("CREATE TABLE mut_d(k Int64 PRIMARY KEY, v Nullable(Int64))")
    g.sql("INSERT INTO mut_d VALUES (1, 10), (2, 3), (3, NULL), (4, 20)")
    g.sql("ALTER TABLE mut_d DELETE WHERE v > 5")
    val rows = g.sql("SELECT k FROM mut_d ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(2L, 3L))
    g.sql("DROP TABLE mut_d")
  }

  test("DELETE FROM t WHERE is the lightweight spelling of the same " +
    "mutation") {
    g.sql("DROP TABLE IF EXISTS mut_lw")
    g.sql("CREATE TABLE mut_lw(k Int64 PRIMARY KEY, tag String)")
    g.sql("INSERT INTO mut_lw VALUES (1, 'keep'), (2, 'drop'), (3, 'keep')")
    g.sql("DELETE FROM mut_lw WHERE tag = 'drop'")
    assert(g.sql("SELECT count(*) AS n FROM mut_lw").collect()(0)
      .getLong(0) === 2L)
    g.sql("DROP TABLE mut_lw")
  }

  test("UPDATE evaluates RHSs on the PRE-mutation row: a = b, b = a " +
    "swaps, and function-call commas parse (balanced slice)") {
    g.sql("DROP TABLE IF EXISTS mut_u")
    g.sql("CREATE TABLE mut_u(k Int64 PRIMARY KEY, a Int64, b Int64)")
    g.sql("INSERT INTO mut_u VALUES (1, 1, 2), (2, 30, 40), (3, 5, 6)")
    g.sql("ALTER TABLE mut_u UPDATE a = b, b = greatest(a, 10) WHERE k <= 2")
    val rows = g.sql("SELECT k, a, b FROM mut_u ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, 2L, 10L), (2L, 40L, 30L), (3L, 5L, 6L)))
    g.sql("DROP TABLE mut_u")
  }

  test("UPDATE casts the assigned value back to the column's declared " +
    "type") {
    g.sql("DROP TABLE IF EXISTS mut_c")
    g.sql("CREATE TABLE mut_c(k Int64 PRIMARY KEY, n Int32)")
    g.sql("INSERT INTO mut_c VALUES (1, 5)")
    g.sql("ALTER TABLE mut_c UPDATE n = n * 2.5 WHERE k = 1")
    val r = g.sql("SELECT n FROM mut_c").collect()(0)
    assert(r.getInt(0) === 12) // 12.5 cast back to Int32
    g.sql("DROP TABLE mut_c")
  }

  test("UPDATE of a sorting-key column, a partition-expression column, " +
    "or an unknown column is rejected loudly") {
    g.sql("DROP TABLE IF EXISTS mut_r")
    g.sql("CREATE TABLE mut_r(k Int64 PRIMARY KEY, d Date, v Int64) " +
      "PARTITION BY toYear(d)")
    g.sql("INSERT INTO mut_r VALUES (1, '2021-01-01', 5)")
    val e1 = intercept[IllegalArgumentException] {
      g.sql("ALTER TABLE mut_r UPDATE k = 2 WHERE v = 5")
    }
    assert(e1.getMessage.contains("sorting-key"))
    val e2 = intercept[IllegalArgumentException] {
      g.sql("ALTER TABLE mut_r UPDATE d = '2022-01-01' WHERE v = 5")
    }
    assert(e2.getMessage.contains("PARTITION BY"))
    val e3 = intercept[IllegalArgumentException] {
      g.sql("ALTER TABLE mut_r UPDATE nope = 1 WHERE v = 5")
    }
    assert(e3.getMessage.contains("unknown column"))
    g.sql("DROP TABLE mut_r")
  }

  test("only files containing a match are rewritten — the untouched " +
    "partition's files are byte-identical survivors") {
    g.sql("DROP TABLE IF EXISTS mut_p")
    g.sql("CREATE TABLE mut_p(k Int64 PRIMARY KEY, d Date, v Int64) " +
      "PARTITION BY toYear(d)")
    g.sql("INSERT INTO mut_p VALUES (1, '2021-01-01', 5), " +
      "(2, '2021-06-01', 6)")
    g.sql("INSERT INTO mut_p VALUES (3, '2022-01-01', 7), " +
      "(4, '2022-06-01', 8)")
    val loc = tableLoc("mut_p")
    val dirs = {
      val s = java.nio.file.Files.list(loc)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator.asScala.filter(p =>
          java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("__ptk=")).toVector
      } finally s.close()
    }
    assert(dirs.size === 2)
    val files2022 = dirs.find(_.getFileName.toString.contains("2022"))
      .map(listParquet).get
    g.sql("ALTER TABLE mut_p DELETE WHERE v = 5") // 2021 partition only
    val files2022After = dirs.find(_.getFileName.toString.contains("2022"))
      .map(listParquet).get
    assert(files2022After.toSet === files2022.toSet,
      "a mutation matching only 2021 rows must not rewrite 2022 files")
    assert(g.sql("SELECT CAST(sum(v) AS BIGINT) AS s FROM mut_p")
      .collect()(0).getLong(0) === 21L)
    g.sql("DROP TABLE mut_p")
  }

  test("a mutation matching nothing rewrites nothing") {
    g.sql("DROP TABLE IF EXISTS mut_n")
    g.sql("CREATE TABLE mut_n(k Int64 PRIMARY KEY, v Int64)")
    g.sql("INSERT INTO mut_n VALUES (1, 5)")
    val loc = tableLoc("mut_n")
    val before = listParquet(loc)
    g.sql("ALTER TABLE mut_n DELETE WHERE v = 999")
    assert(listParquet(loc).toSet === before.toSet)
    g.sql("DROP TABLE mut_n")
  }

  test("a DELETE that empties a file retires it (the zero-survivor " +
    "witness commits)") {
    g.sql("DROP TABLE IF EXISTS mut_e")
    g.sql("CREATE TABLE mut_e(k Int64 PRIMARY KEY, v Int64)")
    g.sql("INSERT INTO mut_e VALUES (1, 5), (2, 6)")
    g.sql("DELETE FROM mut_e WHERE v >= 5")
    assert(g.sql("SELECT count(*) AS n FROM mut_e").collect()(0)
      .getLong(0) === 0L)
    g.sql("DROP TABLE mut_e")
  }

  test("a mutation failing mid-write rolls BACK: file set untouched, " +
    "intent withdrawn") {
    g.sql("DROP TABLE IF EXISTS mut_f")
    g.sql("CREATE TABLE mut_f(k Int64 PRIMARY KEY, v Int64)")
    g.sql("INSERT INTO mut_f VALUES (1, 5), (2, 6)")
    val loc = tableLoc("mut_f")
    val before = listParquet(loc)
    spark.conf.set("graft.optimize.failpoint", "write")
    try {
      intercept[RuntimeException](g.sql("DELETE FROM mut_f WHERE v = 5"))
    } finally spark.conf.unset("graft.optimize.failpoint")
    assert(!java.nio.file.Files.exists(loc.resolve("_graft_intent")))
    assert(listParquet(loc).toSet === before.toSet)
    assert(g.sql("SELECT count(*) AS n FROM mut_f").collect()(0)
      .getLong(0) === 2L)
    g.sql("DROP TABLE mut_f")
  }

  test("a mutation failing after publish rolls FORWARD on the next " +
    "mutation's replay — applied exactly once, no duplicates") {
    g.sql("DROP TABLE IF EXISTS mut_fw")
    g.sql("CREATE TABLE mut_fw(k Int64 PRIMARY KEY, v Int64)")
    g.sql("INSERT INTO mut_fw VALUES (1, 5), (2, 6), (3, 7)")
    val loc = tableLoc("mut_fw")
    spark.conf.set("graft.optimize.failpoint", "retire")
    try {
      intercept[RuntimeException](g.sql("DELETE FROM mut_fw WHERE v = 5"))
    } finally spark.conf.unset("graft.optimize.failpoint")
    assert(java.nio.file.Files.exists(loc.resolve("_graft_intent")),
      "a post-publish failure must leave the intent for roll-forward")
    // the next mutation replays the predecessor before doing its own work
    g.sql("DELETE FROM mut_fw WHERE v = 6")
    assert(!java.nio.file.Files.exists(loc.resolve("_graft_intent")))
    val rows = g.sql("SELECT k, v FROM mut_fw ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((3L, 7L)))
    g.sql("DROP TABLE mut_fw")
  }

  test("CLEAR COLUMN IN PARTITION resets the column to DEFAULT/type-zero " +
    "inside that partition only") {
    g.sql("DROP TABLE IF EXISTS mut_clear")
    g.sql("CREATE TABLE mut_clear(k Int64, d Date, v Int64, " +
      "s String DEFAULT 'reset') ENGINE=BaseStorage PARTITION BY toYear(d)")
    g.sql("INSERT INTO mut_clear VALUES " +
      "(1, '2021-05-01', 10, 'a'), (2, '2021-06-01', 20, 'b'), " +
      "(3, '2022-01-01', 30, 'c')")
    g.sql("ALTER TABLE mut_clear CLEAR COLUMN v IN PARTITION 2021")
    g.sql("ALTER TABLE mut_clear CLEAR COLUMN s IN PARTITION 2021")
    val rows = g.sql("SELECT k, v, s FROM mut_clear ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // 2021 rows reset (v -> type-zero 0, s -> its declared DEFAULT);
    // the 2022 partition is untouched
    assert(rows === Seq((1L, 0L, "reset"), (2L, 0L, "reset"),
      (3L, 30L, "c")))
    val e = intercept[Exception] {
      g.sql("ALTER TABLE mut_clear CLEAR COLUMN nope IN PARTITION 2021") }
    assert(e.getMessage.contains("no column"))
    g.sql("DROP TABLE mut_clear")
  }
}
