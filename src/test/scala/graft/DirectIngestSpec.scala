package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** The wire-ingest direct part-write path (r19): a streamed block encodes
  * to one parquet part on the server thread — no Spark job — while every
  * table shape needing full INSERT semantics (MV fanout, CHECKs,
  * partitioning, Null engine) falls back to the appendToTable path, and
  * DDL invalidates the cached verdict. Also pins the group-commit
  * machinery behind the fallback path: concurrent flushes land exactly
  * once.
  */
class DirectIngestSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  private def bloomAndSorted(table: String): (Set[String], Boolean) = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val loc = new java.io.File(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table, Some("dis19")))
        .location.toString).getPath)
    val conf = spark.sessionState.newHadoopConf()
    val files = java.nio.file.Files.walk(loc.toPath)
    val parquets =
      try files.iterator.asScala.filter(p =>
        p.getFileName.toString.endsWith(".parquet")).toVector
      finally files.close()
    var blooms = Set.empty[String]
    parquets.foreach { p =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(p.toString), conf))
      try r.getFooter.getBlocks.asScala.foreach { b =>
        blooms ++= b.getColumns.asScala.collect {
          case c if c.getBloomFilterOffset >= 0 => c.getPath.toDotString
        }
      } finally r.close()
    }
    // sortedness: within every file the sort key column is nondecreasing
    val sorted = parquets.forall { p =>
      val ks = spark.read.parquet(p.toString).select("k")
        .collect().map(_.getLong(0))
      ks.sameElements(ks.sorted)
    }
    (blooms, sorted)
  }

  test("a wire block lands as ONE sorted part file with the declared " +
    "bloom filter, and reads back exactly") {
    g.sql("CREATE DATABASE IF NOT EXISTS dis19")
    g.sql("DROP TABLE IF EXISTS dis19.di_t")
    g.sql("CREATE TABLE dis19.di_t(k Int64, s String, " +
      "INDEX s_bf s TYPE bloom_filter(0.01) GRANULARITY 8) " +
      "ENGINE = MergeTree ORDER BY k")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    // unsorted, high-cardinality strings (dictionary-only chunks omit the
    // bloom — the BloomIndexSpec discipline)
    val n = 30000
    val rows = (0 until n).map(i =>
      Row(((i * 2654435761L) % n).abs, s"v${i}_${i * 31}"))
    val before = spark.table("dis19.di_t").inputFiles.length
    g.insertBlock(Some("dis19"), "di_t", rows, schema)
    val files = spark.table("dis19.di_t").inputFiles
    assert(files.length === before + 1, "one flush must land one part file")
    assert(files.exists(_.contains("part-graft-")),
      s"expected a direct-written part, got ${files.mkString(",")}")
    assert(spark.table("dis19.di_t").count() === n.toLong)
    // exact content round-trip
    val back = spark.table("dis19.di_t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(x => (x._1, x._2))
    val want = rows.map(r => (r.getLong(0), r.getString(1)))
      .sortBy(x => (x._1, x._2))
    assert(back.toSeq === want.toSeq)
    val (blooms, sorted) = bloomAndSorted("di_t")
    assert(blooms.contains("s"), s"no bloom filter in direct part: $blooms")
    assert(sorted, "direct part must be sorted by the sorting key")
    g.sql("DROP TABLE dis19.di_t")
  }

  test("a declared CHECK keeps the full INSERT semantics: violating wire " +
    "blocks are rejected, nothing lands") {
    g.sql("CREATE DATABASE IF NOT EXISTS dis19")
    g.sql("DROP TABLE IF EXISTS dis19.di_chk")
    g.sql("CREATE TABLE dis19.di_chk(a Int64, CONSTRAINT pos CHECK a > 0)")
    val schema = StructType(Seq(StructField("a", LongType)))
    g.insertBlock(Some("dis19"), "di_chk", Seq(Row(5L)), schema)
    val e = intercept[Exception] {
      g.insertBlock(Some("dis19"), "di_chk", Seq(Row(-5L)), schema)
    }
    assert(e.getMessage != null)
    assert(spark.table("dis19.di_chk").count() === 1L,
      "violating block must not land")
    g.sql("DROP TABLE dis19.di_chk")
  }

  test("DDL invalidates the cached verdict: an MV created after a direct " +
    "write starts receiving fanout; a RENAME repoints the landing spot") {
    g.sql("CREATE DATABASE IF NOT EXISTS dis19")
    g.sql("DROP TABLE IF EXISTS dis19.di_mv")
    g.sql("DROP TABLE IF EXISTS dis19.di_c")
    g.sql("DROP TABLE IF EXISTS dis19.di_c2")
    g.sql("CREATE TABLE dis19.di_c(a Int64)")
    val schema = StructType(Seq(StructField("a", LongType)))
    g.insertBlock(Some("dis19"), "di_c", Seq(Row(1L)), schema) // direct, caches verdict
    // MV subscription created AFTER the verdict was cached: the next
    // block must take the fanout path, not the frozen direct recipe
    g.sql("CREATE MATERIALIZED VIEW dis19.di_mv AS " +
      "SELECT a * 10 AS b FROM dis19.di_c")
    g.insertBlock(Some("dis19"), "di_c", Seq(Row(7L)), schema)
    assert(spark.table("dis19.di_mv").collect().map(_.getLong(0)).toSet
      === Set(70L), "post-DDL block must fan out to the new MV")
    g.sql("DROP TABLE dis19.di_mv")
    // RENAME moves storage; a stale cached location would strand blocks
    g.sql("RENAME TABLE dis19.di_c TO dis19.di_c2")
    g.insertBlock(Some("dis19"), "di_c2", Seq(Row(9L)), schema)
    assert(spark.table("dis19.di_c2").collect().map(_.getLong(0)).toSet
      === Set(1L, 7L, 9L))
    g.sql("DROP TABLE dis19.di_c2")
  }

  test("group commit (fallback path): 16 concurrent flushes against an " +
    "MV-subscribed table land exactly once, each waiting for its commit") {
    g.sql("CREATE DATABASE IF NOT EXISTS dis19")
    g.sql("DROP TABLE IF EXISTS dis19.gc_mv")
    g.sql("DROP TABLE IF EXISTS dis19.gc_t")
    g.sql("CREATE TABLE dis19.gc_t(w Int64, v Int64)")
    // the MV subscription forces the appendToTable (group-commit) path
    g.sql("CREATE MATERIALIZED VIEW dis19.gc_mv AS " +
      "SELECT sum(v) AS sv FROM dis19.gc_t")
    val schema = StructType(Seq(
      StructField("w", LongType), StructField("v", LongType)))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ths = (1 to 16).map { w =>
      val th = new Thread(() => {
        try g.insertBlock(Some("dis19"), "gc_t",
          (1 to 50).map(v => Row(w.toLong, v.toLong)), schema)
        catch { case e: Throwable => errs.add(e) }
      })
      th.start(); th
    }
    ths.foreach(_.join())
    assert(errs.isEmpty, s"concurrent flushes failed: ${errs.peek()}")
    assert(spark.table("dis19.gc_t").count() === 800L)
    // every (w, v) pair exactly once
    assert(spark.sql("SELECT count(*) FROM (SELECT w, v FROM dis19.gc_t " +
      "GROUP BY w, v HAVING count(*) > 1)").collect()(0).getLong(0) === 0L)
    // MV saw every row exactly once too (sum over all fanout blocks)
    assert(spark.sql("SELECT CAST(sum(sv) AS BIGINT) FROM dis19.gc_mv")
      .collect()(0).getLong(0) === 16L * 1275L)
    g.sql("DROP TABLE dis19.gc_mv"); g.sql("DROP TABLE dis19.gc_t")
  }

  test("partitioned and Null-engine tables fall back with full semantics") {
    g.sql("CREATE DATABASE IF NOT EXISTS dis19")
    g.sql("DROP TABLE IF EXISTS dis19.di_p")
    g.sql("CREATE TABLE dis19.di_p(d Date, v Int64) " +
      "ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY v")
    val schema = StructType(Seq(
      StructField("d", DateType), StructField("v", LongType)))
    g.insertBlock(Some("dis19"), "di_p", Seq(
      Row(java.sql.Date.valueOf("2021-01-05"), 1L),
      Row(java.sql.Date.valueOf("2021-02-06"), 2L)), schema)
    assert(spark.table("dis19.di_p").count() === 2L)
    // partition pruning still works (the __ptk machinery ran)
    assert(g.sql("SELECT count() AS c FROM dis19.di_p " +
      "WHERE toYYYYMM(d) = 202101").collect()(0).get(0).toString === "1")
    g.sql("DROP TABLE dis19.di_p")

    g.sql("DROP TABLE IF EXISTS dis19.di_n")
    g.sql("CREATE TABLE dis19.di_n(a Int64) ENGINE = Null")
    g.insertBlock(Some("dis19"), "di_n",
      Seq(Row(1L)), StructType(Seq(StructField("a", LongType))))
    assert(spark.table("dis19.di_n").count() === 0L,
      "Null engine must land nothing")
    g.sql("DROP TABLE dis19.di_n")
  }
}
