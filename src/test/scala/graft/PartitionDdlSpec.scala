package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** ClickHouse partition DDL: `ALTER TABLE t DROP|DETACH|ATTACH PARTITION v`
  * plus the `system.parts` / `system.detached_parts` introspection.
  * Partitions are `__ptk=<v>` directories, so every op is metadata-scale
  * (one directory delete/rename) regardless of table size — the 100 TB
  * retention contract. Detached data hides under `_graft_detached/`
  * (underscore rule keeps it out of every scan) until re-attached.
  */
class PartitionDdlSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  private def mk(table: String): Unit = {
    g.sql(s"DROP TABLE IF EXISTS $table")
    g.sql(s"CREATE TABLE $table(k Int64, d Date) " +
      "ENGINE=BaseStorage PARTITION BY toYear(d)")
    g.sql(s"INSERT INTO $table VALUES " +
      "(1, '2021-01-05'), (2, '2021-06-01'), " +
      "(3, '2022-03-03'), (4, '2022-08-08'), (5, '2023-02-02')")
  }

  private def years(table: String): Seq[Int] =
    g.sql(s"SELECT CAST(toYear(d) AS INT) AS yr FROM $table " +
      "GROUP BY 1 ORDER BY 1").collect().map(_.getInt(0)).toSeq

  private def loc(table: String): java.nio.file.Path =
    java.nio.file.Paths.get(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table, Some("default"))
      ).location.toString).getPath)

  test("DROP PARTITION deletes exactly one partition directory; a " +
    "missing partition drops silently (CH behavior)") {
    mk("pd_drop")
    g.sql("ALTER TABLE pd_drop DROP PARTITION '2022'")
    assert(years("pd_drop") === Seq(2021, 2023))
    assert(!java.nio.file.Files.exists(loc("pd_drop").resolve("__ptk=2022")))
    assert(java.nio.file.Files.exists(loc("pd_drop").resolve("__ptk=2021")))
    g.sql("ALTER TABLE pd_drop DROP PARTITION '1999'") // no-op, no error
    assert(years("pd_drop") === Seq(2021, 2023))
    g.sql("DROP TABLE pd_drop")
  }

  test("DETACH hides the partition from scans (moved under " +
    "_graft_detached), ATTACH restores it — data identical") {
    mk("pd_det")
    val before = g.sql("SELECT CAST(sum(k) AS BIGINT) AS s FROM pd_det")
      .collect()(0).getLong(0)
    g.sql("ALTER TABLE pd_det DETACH PARTITION '2022'")
    assert(years("pd_det") === Seq(2021, 2023))
    assert(java.nio.file.Files.isDirectory(
      loc("pd_det").resolve("_graft_detached").resolve("__ptk=2022")))
    g.sql("ALTER TABLE pd_det ATTACH PARTITION '2022'")
    assert(years("pd_det") === Seq(2021, 2022, 2023))
    assert(g.sql("SELECT CAST(sum(k) AS BIGINT) AS s FROM pd_det")
      .collect()(0).getLong(0) === before)
    assert(!java.nio.file.Files.exists(
      loc("pd_det").resolve("_graft_detached").resolve("__ptk=2022")))
    g.sql("DROP TABLE pd_det")
  }

  test("inserting into a detached partition's key range creates a FRESH " +
    "live partition; ATTACH then refuses rather than silently merging") {
    mk("pd_clash")
    g.sql("ALTER TABLE pd_clash DETACH PARTITION '2021'")
    g.sql("INSERT INTO pd_clash VALUES (9, '2021-12-31')")
    assert(g.sql("SELECT CAST(sum(k) AS BIGINT) AS s FROM pd_clash " +
      "WHERE toYear(d) = 2021").collect()(0).getLong(0) === 9L)
    intercept[Exception] { g.sql("ALTER TABLE pd_clash ATTACH PARTITION '2021'") }
    g.sql("DROP TABLE pd_clash")
  }

  test("ATTACH of a never-detached partition errors; partition ops on an " +
    "unpartitioned table error") {
    mk("pd_err")
    intercept[Exception] { g.sql("ALTER TABLE pd_err ATTACH PARTITION '1999'") }
    g.sql("DROP TABLE pd_err")
    g.sql("DROP TABLE IF EXISTS pd_flat")
    g.sql("CREATE TABLE pd_flat(k Int64)")
    intercept[Exception] { g.sql("ALTER TABLE pd_flat DROP PARTITION '1'") }
    g.sql("DROP TABLE pd_flat")
  }

  test("system.parts reports per-file rows/bytes by partition from " +
    "parquet footers; detached parts move to system.detached_parts") {
    mk("pd_parts")
    val live = g.sql("SELECT partition, CAST(sum(rows) AS BIGINT) AS r " +
      "FROM system.parts WHERE `table` = 'pd_parts' " +
      "GROUP BY partition ORDER BY partition").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(live === Seq(("2021", 2L), ("2022", 2L), ("2023", 1L)))
    g.sql("ALTER TABLE pd_parts DETACH PARTITION '2021'")
    val live2 = g.sql("SELECT partition FROM system.parts " +
      "WHERE `table` = 'pd_parts' GROUP BY partition ORDER BY partition")
      .collect().map(_.getString(0)).toSeq
    assert(live2 === Seq("2022", "2023"))
    val det = g.sql("SELECT partition, count(*) AS n " +
      "FROM system.detached_parts WHERE `table` = 'pd_parts' " +
      "GROUP BY partition").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(det.map(_._1) === Seq("2021") && det.head._2 >= 1L)
    g.sql("DROP TABLE pd_parts")
  }

  test("IN PARTITION scopes a mutation: rows matching the predicate in " +
    "OTHER partitions survive, and only the scoped partition's files " +
    "rewrite") {
    mk("pd_mut")
    // k is odd in 2021 (1) and 2023 (5); delete odds ONLY in 2021
    g.sql("ALTER TABLE pd_mut DELETE IN PARTITION '2021' WHERE k % 2 = 1")
    val kept = g.sql("SELECT k FROM pd_mut ORDER BY k").collect()
      .map(_.getLong(0)).toSeq
    assert(kept === Seq(2L, 3L, 4L, 5L))
    g.sql("ALTER TABLE pd_mut UPDATE k = k + 100 IN PARTITION '2022' " +
      "WHERE k >= 3")
    val kept2 = g.sql("SELECT k FROM pd_mut ORDER BY k").collect()
      .map(_.getLong(0)).toSeq
    assert(kept2 === Seq(2L, 5L, 103L, 104L)) // 5 (2023) untouched
    intercept[Exception] {
      g.sql("DROP TABLE IF EXISTS pd_flat2")
      g.sql("CREATE TABLE pd_flat2(k Int64)")
      g.sql("DELETE FROM pd_flat2 IN PARTITION '1' WHERE k = 1")
    }
    g.sql("DROP TABLE pd_flat2")
    g.sql("DROP TABLE pd_mut")
  }

  test("OPTIMIZE TABLE ... PARTITION compacts only that directory; with " +
    "FINAL it merges only that partition") {
    g.sql("DROP TABLE IF EXISTS pd_opt")
    g.sql("CREATE TABLE pd_opt(k Int64 PRIMARY KEY, ver Int64, d Date) " +
      "ENGINE=ReplacingMergeTree(ver) PARTITION BY toYear(d)")
    g.sql("INSERT INTO pd_opt VALUES (1, 1, '2021-01-01'), " +
      "(1, 2, '2021-06-06'), (7, 1, '2022-01-01'), (7, 2, '2022-06-06')")
    g.sql("OPTIMIZE TABLE pd_opt PARTITION '2021' FINAL")
    // 2021 physically merged to the max-version row; 2022 untouched
    val rows = g.sql("SELECT CAST(toYear(d) AS INT) AS yr, count(*) AS n " +
      "FROM pd_opt GROUP BY 1 ORDER BY 1").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rows === Seq((2021, 1), (2022, 2)))
    assert(g.sql("SELECT ver FROM pd_opt WHERE toYear(d) = 2021")
      .collect()(0).getLong(0) === 2L)
    g.sql("OPTIMIZE TABLE pd_opt PARTITION '1999'") // missing: silent no-op
    g.sql("DROP TABLE pd_opt")
  }

  test("OPTIMIZE TABLE ... DEDUPLICATE removes exact duplicate rows " +
    "(merge-time, whole row), partition-scoped when asked") {
    g.sql("DROP TABLE IF EXISTS pd_dd")
    g.sql("CREATE TABLE pd_dd(k Int64, d Date) ENGINE=BaseStorage " +
      "PARTITION BY toYear(d)")
    g.sql("INSERT INTO pd_dd VALUES (1, '2021-01-01'), (1, '2021-01-01'), " +
      "(2, '2022-02-02'), (2, '2022-02-02')")
    g.sql("OPTIMIZE TABLE pd_dd PARTITION '2021' DEDUPLICATE")
    val byYear = g.sql("SELECT CAST(toYear(d) AS INT) AS yr, count(*) AS n " +
      "FROM pd_dd GROUP BY 1 ORDER BY 1").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(byYear === Seq((2021, 1), (2022, 2))) // 2022 untouched
    g.sql("OPTIMIZE TABLE pd_dd DEDUPLICATE")
    assert(g.sql("SELECT count(*) AS n FROM pd_dd").collect()(0)
      .getLong(0) === 2L)
    g.sql("DROP TABLE pd_dd")
  }

  test("an unpartitioned table appears in system.parts under partition " +
    "'all' (CH's naming)") {
    g.sql("DROP TABLE IF EXISTS pd_all")
    g.sql("CREATE TABLE pd_all(k Int64)")
    g.sql("INSERT INTO pd_all VALUES (1), (2), (3)")
    val r = g.sql("SELECT partition, CAST(sum(rows) AS BIGINT) AS r " +
      "FROM system.parts WHERE `table` = 'pd_all' GROUP BY partition")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(r === Seq(("all", 3L)))
    g.sql("DROP TABLE pd_all")
  }
}
