package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** `INDEX n col TYPE bloom_filter` wired to REAL parquet bloom filters
  * (r17): the clause is no longer documentation — it becomes a table
  * OPTION (`parquet.bloom.filter.enabled#col`) that every write path
  * through the relation honors, and parquet-mr's row-group filtering
  * consults the filter for equality/IN predicates at scan time. These
  * tests check the FOOTER (a bloom filter physically present for the
  * indexed column, absent for others), query correctness, and that the
  * option survives script replay (TRUNCATE) via the normalized script's
  * re-emitted INDEX clause.
  */
class BloomIndexSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  /** Column paths with a bloom filter in any row group of any parquet
    * file under the table's location.
    */
  private def bloomColumns(table: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val loc = new java.io.File(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table, Some("default")))
        .location.toString).getPath)
    val conf = spark.sessionState.newHadoopConf()
    val files = java.nio.file.Files.walk(loc.toPath)
    val parquets =
      try files.iterator.asScala.filter(p =>
        p.getFileName.toString.endsWith(".parquet")).toVector
      finally files.close()
    parquets.flatMap { p =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(p.toString), conf))
      try r.getFooter.getBlocks.asScala.flatMap { b =>
        b.getColumns.asScala.collect {
          case c if c.getBloomFilterOffset >= 0 =>
            c.getPath.toDotString
        }
      } finally r.close()
    }.toSet
  }

  test("a declared bloom_filter index lands in the parquet footer for " +
    "exactly the indexed column; equality scans stay correct") {
    g.sql("DROP TABLE IF EXISTS bfi_t")
    g.sql("CREATE TABLE bfi_t(k Int64, s String, v Float64, " +
      "INDEX s_bf s TYPE bloom_filter(0.01) GRANULARITY 8)")
    // HIGH-cardinality strings: parquet (correctly) omits the bloom when
    // a chunk stays fully dictionary-encoded — the dictionary already
    // filters equality exactly, which is CH's `set` index analog; the
    // bloom pays off precisely where dictionaries give up (probed:
    // 1000-distinct/20k-row chunks carry NO bloom, all-distinct do)
    g.sql("INSERT INTO bfi_t SELECT id AS k, " +
      "concat('u', CAST(id AS STRING)) AS s, " +
      "CAST(id AS DOUBLE) / 7 AS v FROM range(20000)")
    val blooms = bloomColumns("bfi_t")
    assert(blooms.contains("s"), s"no bloom filter written for s: $blooms")
    assert(!blooms.contains("v"),
      s"bloom filter written for an UN-indexed column: $blooms")
    // the filter must not change results (row-group skipping only)
    assert(g.sql("SELECT count(*) AS n FROM bfi_t WHERE s = 'u77'")
      .head().getLong(0) === 1L)
    assert(g.sql("SELECT count(*) AS n FROM bfi_t WHERE s = 'nope'")
      .head().getLong(0) === 0L)
    g.sql("DROP TABLE bfi_t")
  }

  test("parts are SORTED by the sorting key: an insert of shuffled rows " +
    "into a PRIMARY KEY table lands as sorted runs (row-group stats on " +
    "the key become range pruners)") {
    g.sql("DROP TABLE IF EXISTS bfi_srt")
    g.sql("CREATE TABLE bfi_srt(k Int64 PRIMARY KEY, v Float64) " +
      "ENGINE=MergeTree ORDER BY k")
    // reversed + interleaved input order
    g.sql("INSERT INTO bfi_srt SELECT CAST((19999 - id) AS BIGINT) AS k, " +
      "CAST(id AS DOUBLE) AS v FROM range(20000)")
    import scala.jdk.CollectionConverters._
    val loc = new java.io.File(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("bfi_srt",
          Some("default"))).location.toString).getPath)
    val walk = java.nio.file.Files.walk(loc.toPath)
    val files =
      try walk.iterator.asScala.filter(_.getFileName.toString
        .endsWith(".parquet")).toVector
      finally walk.close()
    assert(files.nonEmpty)
    // each FILE is one sorted run: a single-file read is one split at
    // this size, so collect order == row order
    files.foreach { f =>
      val ks = spark.read.parquet(f.toString).select("k")
        .collect().map(_.getLong(0))
      assert(ks.zip(ks.tail).forall { case (a, b) => a <= b },
        s"file ${f.getFileName} is not sorted by the sorting key")
    }
    assert(g.sql("SELECT count(*) AS n FROM bfi_srt").head().getLong(0)
      === 20000L)
    g.sql("DROP TABLE bfi_srt")
  }

  test("the bloom option survives script replay: SHOW CREATE keeps the " +
    "INDEX clause and a TRUNCATE-replayed table still writes filters") {
    g.sql("DROP TABLE IF EXISTS bfi_r")
    g.sql("CREATE TABLE bfi_r(k Int64, s String, " +
      "INDEX s_bf s TYPE bloom_filter GRANULARITY 1)")
    g.sql("INSERT INTO bfi_r VALUES (1, 'a')")
    assert(bloomColumns("bfi_r").contains("s"))
    // TRUNCATE replays the NORMALIZED script — the INDEX clause must be
    // re-emitted there or the option silently vanishes
    g.sql("TRUNCATE TABLE bfi_r")
    g.sql("INSERT INTO bfi_r VALUES (2, 'b')")
    assert(bloomColumns("bfi_r").contains("s"),
      "bloom filter lost across TRUNCATE script replay")
    val script = g.sql("SHOW CREATE TABLE bfi_r").head().getString(0)
    assert(script.toLowerCase.contains("bloom_filter"), script)
    g.sql("DROP TABLE bfi_r")
  }

  test("ALTER TABLE ADD INDEX wires new writes; MATERIALIZE INDEX " +
    "rewrites existing files; DROP INDEX detaches") {
    g.sql("DROP TABLE IF EXISTS bfi_a")
    g.sql("CREATE TABLE bfi_a(k Int64, s String)")
    g.sql("INSERT INTO bfi_a SELECT id, concat('p', CAST(id AS STRING)) " +
      "FROM range(20000)")
    assert(bloomColumns("bfi_a").isEmpty)
    g.sql("ALTER TABLE bfi_a ADD INDEX s_bf s TYPE bloom_filter GRANULARITY 4")
    // old files untouched; NEW writes carry the filter
    g.sql("INSERT INTO bfi_a SELECT id, concat('q', CAST(id AS STRING)) " +
      "FROM range(20000, 40000)")
    assert(bloomColumns("bfi_a").contains("s"))
    // MATERIALIZE rewrites the old files too: afterwards EVERY file has it
    g.sql("ALTER TABLE bfi_a MATERIALIZE INDEX s_bf")
    assert(g.sql("SELECT count(*) AS n FROM bfi_a").head().getLong(0)
      === 40000L)
    assert(bloomColumns("bfi_a").contains("s"))
    // duplicate ADD errors without IF NOT EXISTS; passes with it
    val e = intercept[Exception] {
      g.sql("ALTER TABLE bfi_a ADD INDEX s_bf2 s TYPE bloom_filter") }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    g.sql("ALTER TABLE bfi_a ADD INDEX IF NOT EXISTS s_bf2 s TYPE bloom_filter")
    // DROP detaches: addressable by column or bf_<col>; future writes bare
    g.sql("ALTER TABLE bfi_a DROP INDEX bf_s")
    val e2 = intercept[Exception] {
      g.sql("ALTER TABLE bfi_a DROP INDEX nothere") }
    assert(e2.getMessage.contains("no tracked index"), e2.getMessage)
    g.sql("ALTER TABLE bfi_a DROP INDEX IF EXISTS nothere")
    g.sql("DROP TABLE bfi_a")
  }

  test("OPTIMIZE keeps declared bloom filters and sorted runs (rewrites " +
    "bypass the catalog relation and must re-apply the part physics)") {
    g.sql("DROP TABLE IF EXISTS bfi_o")
    g.sql("CREATE TABLE bfi_o(k Int64 PRIMARY KEY, s String, " +
      "INDEX s_bf s TYPE bloom_filter GRANULARITY 1) ENGINE=MergeTree " +
      "ORDER BY k SETTINGS target_file_mb=1")
    // two high-cardinality inserts in reversed key order -> two files
    g.sql("INSERT INTO bfi_o SELECT CAST((9999 - id) AS BIGINT), " +
      "concat('x', CAST(id AS STRING)) FROM range(10000)")
    g.sql("INSERT INTO bfi_o SELECT CAST((19999 - id) AS BIGINT), " +
      "concat('y', CAST(id AS STRING)) FROM range(10000, 20000)")
    assert(bloomColumns("bfi_o").contains("s"))
    g.sql("OPTIMIZE TABLE bfi_o")
    assert(g.sql("SELECT count(*) AS n FROM bfi_o").head().getLong(0)
      === 20000L)
    assert(bloomColumns("bfi_o").contains("s"),
      "OPTIMIZE rewrite dropped the declared bloom filter")
    g.sql("DROP TABLE bfi_o")
  }
}
