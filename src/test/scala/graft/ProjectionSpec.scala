package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** ClickHouse projections: ALTER TABLE ADD PROJECTION creates a hidden
  * pre-aggregated table maintained by the MV insert-fanout; ProjectionRoute
  * rewrites matching aggregates onto it (re-aggregating the per-block
  * partials); mutations rebuild it; DDL that would desynchronize it is
  * rejected.
  */
class ProjectionSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val g = {
    val s = spark.newSession()
    val gs = new GraftSession(s)
    gs.sql("CREATE DATABASE IF NOT EXISTS proj_db")
    gs.sql("USE proj_db")
    gs
  }

  private def routed(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("__proj_")

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  /** The same statement with routing OFF — the ground truth. */
  private def unrouted(sql: String): Seq[Seq[Any]] = {
    g.spark.conf.set("spark.graft.useProjections", "false")
    try sortedRows(g.sql(sql))
    finally g.spark.conf.set("spark.graft.useProjections", "true")
  }

  test("aggregates route to the projection and stay exact across inserts") {
    g.sql("DROP TABLE IF EXISTS pt")
    g.sql("CREATE TABLE pt(k Int64, cat String, v Int64, w Decimal(12,2))")
    g.sql("INSERT INTO pt VALUES (1,'a',10,'1.50'),(2,'b',20,'2.25'),(3,'a',30,'0.75')")
    g.sql("ALTER TABLE pt ADD PROJECTION by_cat " +
      "(SELECT cat, sum(v) AS sv, sum(w) AS sw, min(v) AS mv, max(v) AS xv, " +
      "count() AS c, count(v) AS cv GROUP BY cat)")
    // fanout appends per-block partials: two more blocks, one a duplicate key
    g.sql("INSERT INTO pt VALUES (4,'b',40,'3.00'),(5,'c',50,'4.10')")
    g.sql("INSERT INTO pt SELECT 6, 'a', 60, CAST('5.00' AS DECIMAL(12,2))")

    val q = "SELECT cat, sum(v) AS sv, min(v) AS mv, max(v) AS xv, " +
      "count() AS c, count(v) AS cv, sum(w) AS sw FROM pt GROUP BY cat ORDER BY cat"
    val df = g.sql(q)
    assert(routed(df), s"not routed:\n${df.queryExecution.optimizedPlan}")
    assert(sortedRows(df) === unrouted(q))
    // output schema unchanged by routing (names, types, order)
    g.spark.conf.set("spark.graft.useProjections", "false")
    val offSchema = try g.sql(q).schema
      finally g.spark.conf.set("spark.graft.useProjections", "true")
    assert(df.schema.map(f => (f.name, f.dataType)) ===
      offSchema.map(f => (f.name, f.dataType)))

    // global aggregate (no GROUP BY) routes too
    val gq = "SELECT sum(v) AS sv, count() AS c FROM pt"
    val gdf = g.sql(gq)
    assert(routed(gdf))
    assert(sortedRows(gdf) === unrouted(gq))
  }

  test("filters on projection keys route; other columns do not") {
    val fq = "SELECT cat, sum(v) AS sv FROM pt WHERE cat IN ('a','c') GROUP BY cat"
    val fdf = g.sql(fq)
    assert(routed(fdf), s"key-filtered aggregate must route:\n" +
      s"${fdf.queryExecution.optimizedPlan}")
    assert(sortedRows(fdf) === unrouted(fq))

    // k is not a projection column: the aggregate must stay on the parent
    val nf = g.sql("SELECT cat, sum(v) AS sv FROM pt WHERE k > 2 GROUP BY cat")
    assert(!routed(nf), "filter on a non-projected column must not route")
    // unsupported aggregate (avg) must not route
    val na = g.sql("SELECT cat, avg(v) AS av FROM pt GROUP BY cat")
    assert(!routed(na), "avg is not stored — must not route")
  }

  test("mutations rebuild the projection; results stay exact") {
    g.sql("ALTER TABLE pt UPDATE v = v + 100 WHERE cat = 'a'")
    val q = "SELECT cat, sum(v) AS sv, count() AS c FROM pt GROUP BY cat"
    val df = g.sql(q)
    assert(routed(df))
    assert(sortedRows(df) === unrouted(q))

    g.sql("ALTER TABLE pt DELETE WHERE v >= 150")
    val df2 = g.sql(q)
    assert(routed(df2))
    assert(sortedRows(df2) === unrouted(q))
  }

  test("column DDL on projected columns is rejected; others pass") {
    val e = intercept[Exception](g.sql("ALTER TABLE pt DROP COLUMN v"))
    assert(e.getMessage.contains("projection"), e.getMessage)
    g.sql("ALTER TABLE pt ADD COLUMN extra Int64")
    g.sql("ALTER TABLE pt DROP COLUMN extra")
  }

  test("TRUNCATE keeps the projection definition; DROP PROJECTION removes " +
    "routing and the hidden table") {
    g.sql("DROP TABLE IF EXISTS pt2")
    g.sql("CREATE TABLE pt2(k Int64, v Int64)")
    g.sql("INSERT INTO pt2 VALUES (1, 10), (2, 20)")
    g.sql("ALTER TABLE pt2 ADD PROJECTION pk (SELECT k, sum(v) AS sv GROUP BY k)")
    g.sql("TRUNCATE TABLE pt2")
    g.sql("INSERT INTO pt2 VALUES (3, 30)")
    val q = "SELECT k, sum(v) AS sv FROM pt2 GROUP BY k"
    val df = g.sql(q)
    assert(routed(df), "projection must survive TRUNCATE")
    assert(sortedRows(df) === Seq(Seq(3L, 30L)))

    g.sql("ALTER TABLE pt2 DROP PROJECTION pk")
    assert(!routed(g.sql(q)), "routing must stop after DROP PROJECTION")
    assert(sortedRows(g.sql(q)) === Seq(Seq(3L, 30L)))
    // hidden table is gone (and was never visible in SHOW TABLES)
    assert(!g.spark.catalog.tableExists("proj_db.__proj_pt2_pk"))
    // duplicate ADD errors; IF NOT EXISTS tolerates
    g.sql("ALTER TABLE pt2 ADD PROJECTION pk (SELECT k, sum(v) AS sv GROUP BY k)")
    intercept[Exception](g.sql(
      "ALTER TABLE pt2 ADD PROJECTION pk (SELECT k, sum(v) AS sv GROUP BY k)"))
    g.sql("ALTER TABLE pt2 ADD PROJECTION IF NOT EXISTS pk " +
      "(SELECT k, sum(v) AS sv GROUP BY k)")
    // MATERIALIZE rebuilds in place
    g.sql("ALTER TABLE pt2 MATERIALIZE PROJECTION pk")
    assert(sortedRows(g.sql(q)) === Seq(Seq(3L, 30L)))
  }

  test("PROJECTION declared inline in CREATE TABLE works and survives " +
    "TRUNCATE via script replay") {
    g.sql("DROP TABLE IF EXISTS pt3")
    g.sql("CREATE TABLE pt3(k Int64, cat String, v Int64, " +
      "PROJECTION by_cat (SELECT cat, sum(v) AS sv, count() AS c GROUP BY cat)" +
      ") ENGINE = BaseStorage")
    g.sql("INSERT INTO pt3 VALUES (1,'a',10),(2,'b',20),(3,'a',30)")
    val q = "SELECT cat, sum(v) AS sv, count() AS c FROM pt3 GROUP BY cat"
    val df = g.sql(q)
    assert(routed(df), s"inline projection must route:\n" +
      s"${df.queryExecution.optimizedPlan}")
    assert(sortedRows(df) === unrouted(q))
    // SHOW CREATE keeps the inline clause
    val script = g.sql("SHOW CREATE TABLE pt3").collect()(0).getString(0)
    assert(script.toLowerCase.contains("projection by_cat"), script)
    // TRUNCATE replays the script: projection definition survives, empty;
    // the inline clause and the captured props must not double-add
    g.sql("TRUNCATE TABLE pt3")
    g.sql("INSERT INTO pt3 VALUES (9,'c',90)")
    val df2 = g.sql(q)
    assert(routed(df2))
    assert(sortedRows(df2) === Seq(Seq("c", 90L, 1L)))
    g.sql("DROP TABLE pt3")
  }

  test("projections on a ReplacingMergeTree aggregate RAW rows (CH parity); " +
    "FINAL queries bypass the projection") {
    g.sql("DROP TABLE IF EXISTS pr")
    g.sql("CREATE TABLE pr(k Int64, v Int64, ver Int64) " +
      "ENGINE = ReplacingMergeTree(ver) ORDER BY (k)")
    g.sql("INSERT INTO pr VALUES (1, 10, 1), (2, 20, 1)")
    g.sql("ALTER TABLE pr ADD PROJECTION pv (SELECT k, sum(v) AS sv GROUP BY k)")
    g.sql("INSERT INTO pr VALUES (1, 11, 2)") // supersedes (1,10,1) under FINAL
    // plain SELECT sees raw rows in CH — the routed aggregate must match
    val raw = "SELECT k, sum(v) AS sv FROM pr GROUP BY k"
    val df = g.sql(raw)
    assert(routed(df))
    assert(sortedRows(df) === Seq(Seq(1L, 21L), Seq(2L, 20L)))
    assert(sortedRows(df) === unrouted(raw))
    // FINAL rewrites onto the merged-view subquery: no direct relation
    // scan, so the router must not fire — and values reflect the merge
    val fin = g.sql("SELECT k, sum(v) AS sv FROM pr FINAL GROUP BY k")
    assert(!routed(fin), "FINAL must bypass the projection")
    assert(sortedRows(fin) === Seq(Seq(1L, 11L), Seq(2L, 20L)))
    g.sql("DROP TABLE pr")
  }

  test("hidden projection tables stay out of SHOW TABLES") {
    val names = g.sql("SHOW TABLES").collect().map(_.getString(0)).toSeq
    assert(!names.exists(_.startsWith("__proj_")), names.toString)
    assert(names.contains("pt"))
  }
}
