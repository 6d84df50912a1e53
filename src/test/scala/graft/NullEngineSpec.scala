package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** ENGINE=Null — ClickHouse's discard table: INSERTs land nothing, but
  * subscribed materialized views still see every inserted block. The
  * Null-table + MV pair is CH's canonical ingest-transform idiom.
  */
class NullEngineSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  test("inserts into a Null table land nothing; subscribed MVs see the " +
    "blocks (the CH ingest-transform idiom)") {
    g.sql("DROP TABLE IF EXISTS null_mv")
    g.sql("DROP TABLE IF EXISTS null_in")
    g.sql("CREATE TABLE null_in(k Int64, v Int64) ENGINE=Null")
    g.sql("CREATE MATERIALIZED VIEW null_mv AS " +
      "SELECT k, v * 2 AS dv FROM null_in")
    g.sql("INSERT INTO null_in VALUES (1, 10), (2, 20)")
    g.sql("INSERT INTO null_in VALUES (3, 30)")
    assert(g.sql("SELECT count() AS n FROM null_in").collect()(0)
      .getLong(0) === 0L, "a Null table never stores rows")
    val mv = g.sql("SELECT k, dv FROM null_mv ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(mv === Seq((1L, 20L), (2L, 40L), (3L, 60L)),
      "every inserted block must flow into the MV")
    g.sql("DROP TABLE null_mv")
    g.sql("DROP TABLE null_in")
  }
}
