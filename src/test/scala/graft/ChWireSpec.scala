package graft

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket

import org.scalatest.funsuite.AnyFunSuite

import graft.server.{ChProto, ChWireServer}

/** Drives a real TCP socket through the ClickHouse-native framing:
  * Hello handshake, Ping/Pong, and a CREATE / INSERT / SELECT round-trip —
  * the shape of the reference's wire-level sanity suite
  * (crates/tests_integ/tests/sanity_checks.rs) minus a real
  * clickhouse-client, which this environment does not ship; the test
  * client below implements the client half of the same framing
  * (messages.rs:234-340).
  */
class ChWireSpec extends AnyFunSuite {
  import SparkTestSession.spark

  /** Minimal CH-native client: hello + query, collecting data blocks. */
  private final class WireClient(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    private val in = new BufferedInputStream(sock.getInputStream)
    private val out = new BufferedOutputStream(sock.getOutputStream)

    def hello(database: String = ""): (String, Long) = {
      ChProto.writeVarint(out, ChProto.Client.Hello)
      ChProto.writeStr(out, "graft-test-client")
      ChProto.writeVarint(out, 1); ChProto.writeVarint(out, 0)
      ChProto.writeVarint(out, ChProto.Revision)
      ChProto.writeStr(out, database)
      ChProto.writeStr(out, "default"); ChProto.writeStr(out, "")
      out.flush()
      val code = ChProto.readVarint(in)
      assert(code == ChProto.Server.Hello, s"expected server hello, got $code")
      val name = ChProto.readStr(in)
      val _maj = ChProto.readVarint(in); val _min = ChProto.readVarint(in)
      val rev = ChProto.readVarint(in)
      val _tz = ChProto.readStr(in); val _display = ChProto.readStr(in)
      val _patch = ChProto.readVarint(in)
      (name, rev)
    }

    def ping(): Boolean = {
      ChProto.writeVarint(out, ChProto.Client.Ping); out.flush()
      ChProto.readVarint(in) == ChProto.Server.Pong
    }

    /** Send a Query packet; gather data blocks until EndOfStream. */
    def query(sql: String): Seq[ChProto.WireBlock] = {
      ChProto.writeVarint(out, ChProto.Client.Query)
      ChProto.writeStr(out, "test-query-id")
      ChProto.writeVarint(out, 1) // query kind: initial
      ChProto.writeStr(out, ""); ChProto.writeStr(out, ""); ChProto.writeStr(out, "")
      ChProto.writeVarint(out, 1) // interface: tcp
      ChProto.writeStr(out, ""); ChProto.writeStr(out, "")
      ChProto.writeStr(out, "graft-test-client")
      ChProto.writeVarint(out, 1); ChProto.writeVarint(out, 0)
      ChProto.writeVarint(out, ChProto.Revision)
      ChProto.writeStr(out, "") // quota key
      ChProto.writeVarint(out, 0) // client patch
      ChProto.writeStr(out, "") // settings: empty set
      ChProto.writeVarint(out, 2) // stage: complete
      ChProto.writeVarint(out, 0) // compression: off
      ChProto.writeStr(out, sql)
      out.flush()
      val blocks = Vector.newBuilder[ChProto.WireBlock]
      var done = false
      while (!done) {
        ChProto.readVarint(in) match {
          case ChProto.Server.Data => blocks += ChProto.readDataBlock(in)
          case ChProto.Server.EndOfStream => done = true
          case ChProto.Server.Exception =>
            val _code = ChProto.readBytes(in, 4)
            val name = ChProto.readStr(in)
            val msg = ChProto.readStr(in)
            val _stack = ChProto.readStr(in); val _nested = ChProto.readVarint(in)
            fail(s"server exception $name: $msg")
          case other => fail(s"unexpected server packet $other")
        }
      }
      blocks.result()
    }

    /** INSERT with client-streamed Data blocks: send the query, read the
      * server's header block, stream row blocks, terminate with an empty
      * block, expect EndOfStream.
      */
    def insertStream(sql: String,
                     schema: org.apache.spark.sql.types.StructType,
                     batches: Seq[Seq[org.apache.spark.sql.Row]]): ChProto.WireBlock = {
      ChProto.writeVarint(out, ChProto.Client.Query)
      ChProto.writeStr(out, "test-insert-id")
      ChProto.writeVarint(out, 1)
      ChProto.writeStr(out, ""); ChProto.writeStr(out, ""); ChProto.writeStr(out, "")
      ChProto.writeVarint(out, 1)
      ChProto.writeStr(out, ""); ChProto.writeStr(out, "")
      ChProto.writeStr(out, "graft-test-client")
      ChProto.writeVarint(out, 1); ChProto.writeVarint(out, 0)
      ChProto.writeVarint(out, ChProto.Revision)
      ChProto.writeStr(out, "")
      ChProto.writeVarint(out, 0)
      ChProto.writeStr(out, "")
      ChProto.writeVarint(out, 2)
      ChProto.writeVarint(out, 0)
      ChProto.writeStr(out, sql)
      out.flush()
      // server replies with the table-structure header block
      assert(ChProto.readVarint(in) === ChProto.Server.Data, "expected header block")
      val header = ChProto.readDataBlock(in)
      batches.foreach(rows =>
        ChProto.writeDataBlock(out, schema, rows, ChProto.Client.Data))
      ChProto.writeDataBlock(out, schema, Seq.empty, ChProto.Client.Data) // EODP
      out.flush()
      assert(ChProto.readVarint(in) === ChProto.Server.EndOfStream)
      header
    }

    def close(): Unit = sock.close()
  }

  test("hello, ping, and CREATE/INSERT/SELECT round-trip over the socket") {
    val server = new ChWireServer(spark).start()
    val client = new WireClient(server.boundPort)
    try {
      val (name, rev) = client.hello()
      assert(name === ChProto.ServerName)
      assert(rev === ChProto.Revision)
      assert(client.ping())

      client.query("DROP TABLE IF EXISTS wire_tab")
      client.query("CREATE TABLE wire_tab(a Int32, s String, d Date)")
      client.query(
        "INSERT INTO wire_tab VALUES (1, 'x', '2021-01-05'), (2, 'y', '2022-07-01')")

      val blocks = client.query(
        "SELECT a, s, d, CAST(NULL AS INT) AS nn FROM wire_tab ORDER BY a")
      val rows = blocks.filter(_.nRows > 0)
      assert(rows.map(_.nRows).sum === 2)
      val b = rows.head
      assert(b.columns.map(_.name) === Vector("a", "s", "d", "nn"))
      // engine-table columns are nullable unless declared NOT NULL, and the
      // wire type reports that honestly
      assert(b.columns(0).chType === "Nullable(Int32)")
      assert(b.columns(0).values === Vector(1, 2))
      assert(b.columns(1).values === Vector("x", "y"))
      assert(b.columns(2).values === Vector(
        java.time.LocalDate.parse("2021-01-05"),
        java.time.LocalDate.parse("2022-07-01")))
      assert(b.columns(3).chType.startsWith("Nullable("))
      assert(b.columns(3).values === Vector(null, null))

      // aggregate comes back typed (sum(Int32) -> Int64 wire type)
      val agg = client.query(
        "SELECT CAST(sum(a) AS BIGINT) AS s FROM wire_tab").filter(_.nRows > 0)
      assert(agg.head.columns(0).chType === "Nullable(Int64)")
      assert(agg.head.columns(0).values === Vector(3L))

      client.query("DROP TABLE wire_tab")
    } finally {
      client.close()
      server.stop()
    }
  }

  test("client-streamed INSERT Data blocks (DataEODPInsertQuery stage)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val server = new ChWireServer(spark).start()
    val client = new WireClient(server.boundPort)
    try {
      client.hello()
      client.query("DROP TABLE IF EXISTS wire_stream_tab")
      client.query("CREATE TABLE wire_stream_tab(a Int32, s String)")
      val schema = StructType(Seq(
        StructField("a", IntegerType), StructField("s", StringType)))
      val header = client.insertStream(
        "INSERT INTO wire_stream_tab FORMAT Native", schema,
        Seq(Seq(Row(1, "x"), Row(2, "y")), Seq(Row(3, null))))
      // the header block advertises the table structure, zero rows
      assert(header.nRows === 0)
      assert(header.columns.map(_.name) === Vector("a", "s"))

      val got = client.query(
        "SELECT a, s FROM wire_stream_tab ORDER BY a").filter(_.nRows > 0).head
      assert(got.columns(0).values === Vector(1, 2, 3))
      assert(got.columns(1).values === Vector("x", "y", null))
      client.query("DROP TABLE wire_stream_tab")
    } finally {
      client.close()
      server.stop()
    }
  }

  test("old client revisions are rejected like the reference (messages.rs:255)") {
    val server = new ChWireServer(spark).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val out = new BufferedOutputStream(sock.getOutputStream)
      val in = new BufferedInputStream(sock.getInputStream)
      ChProto.writeVarint(out, ChProto.Client.Hello)
      ChProto.writeStr(out, "old-client")
      ChProto.writeVarint(out, 1); ChProto.writeVarint(out, 0)
      ChProto.writeVarint(out, 54000L) // too old
      ChProto.writeStr(out, ""); ChProto.writeStr(out, ""); ChProto.writeStr(out, "")
      out.flush()
      assert(ChProto.readVarint(in) === ChProto.Server.Exception)
    } finally {
      sock.close()
      server.stop()
    }
  }
}
