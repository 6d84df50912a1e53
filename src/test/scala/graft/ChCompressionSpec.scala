package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.server.{ChProto, ChWireServer, CityHash, Lz4Frames}

/** LZ4+CityHash128 compressed frame transport. The CityHash implementation
  * must match the exact 1.0.2 revision ClickHouse pinned — proven here
  * against the reference's golden COMPRESSED_EMPTY_CLIENT_BLK_BYTES
  * (crates/runtime/src/ch/blocks.rs:146-150 and its unit test at :610-621),
  * the one externally-produced compressed frame available in this
  * environment (no clickhouse-client ships here to interop against).
  */
class ChCompressionSpec extends AnyFunSuite {
  import SparkTestSession.spark

  // blocks.rs:146-150 — [pkid, name] ++ [16B cityhash] ++ [alg,csz,dsz] ++ lz4
  private val goldenFrame: Array[Byte] = Array(
    0xa7, 0x83, 0xac, 0x6c, 0xd5, 0x5c, 0x7a, 0x7c, 0xb5, 0xac, 0x46, 0xbd,
    0xdb, 0x86, 0xe2, 0x14, 0x82, 0x14, 0x00, 0x00, 0x00, 0x0a, 0x00, 0x00,
    0x00, 0xa0, 0x01, 0x00, 0x02, 0xff, 0xff, 0xff, 0xff, 0x00, 0x00, 0x00
  ).map(_.toByte)

  private val emptyBlockBody: Array[Byte] = Array(
    0x01, 0x00, 0x02, 0xff, 0xff, 0xff, 0xff, 0x00, 0x00, 0x00).map(_.toByte)

  test("CityHash128 v1.0.2 matches the reference's golden checksum") {
    // the checksummed body is [ALG CSZ DSZ LZ4-BLK] = frame bytes 16..36
    val body = goldenFrame.slice(16, 36)
    val h = CityHash.cityHash128(body)
    assert(h.lo === 0x7c7a5cd56cac83a7L) // LE bytes a7 83 ac 6c d5 5c 7a 7c
    assert(h.hi === 0x14e286dbbd46acb5L) // LE bytes b5 ac 46 bd db 86 e2 14
  }

  test("readFrame decodes the reference's golden compressed empty block") {
    val in = new ByteArrayInputStream(goldenFrame)
    assert(Lz4Frames.readFrame(in).toSeq === emptyBlockBody.toSeq)
  }

  test("writeFrame reproduces the golden bytes for the empty block") {
    // 10 incompressible bytes have exactly one minimal LZ4 encoding (one
    // literal run), so byte-identity with the reference frame is expected
    val out = new ByteArrayOutputStream()
    Lz4Frames.writeFrame(out, emptyBlockBody)
    assert(out.toByteArray.toSeq === goldenFrame.toSeq)
  }

  test("frames round-trip across sizes incl. the >128-byte CityHash path") {
    val rng = new scala.util.Random(7)
    // 0, short, CityMurmur len>16, long-hash path, multi-iteration long path
    for (n <- Seq(0, 5, 90, 200, 5000, 100000)) {
      val raw = new Array[Byte](n)
      rng.nextBytes(raw)
      val out = new ByteArrayOutputStream()
      Lz4Frames.writeFrame(out, raw)
      val back = Lz4Frames.readFrame(new ByteArrayInputStream(out.toByteArray))
      assert(back.toSeq === raw.toSeq, s"size $n")
    }
  }

  test("corrupted frame fails its checksum") {
    val out = new ByteArrayOutputStream()
    Lz4Frames.writeFrame(out, Array.tabulate[Byte](64)(_.toByte))
    val bytes = out.toByteArray
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x01).toByte
    val err = intercept[IllegalStateException](
      Lz4Frames.readFrame(new ByteArrayInputStream(bytes)))
    assert(err.getMessage.contains("checksum"))
  }

  test("compressed query + client-streamed INSERT round-trip over the socket") {
    val server = new ChWireServer(spark).start()
    val client = new WireTestClient(server.boundPort, compression = true)
    try {
      client.hello()
      client.query("DROP TABLE IF EXISTS wire_lz4_tab")
      client.query("CREATE TABLE wire_lz4_tab(a Int32, s String)")
      // inline INSERT through a compressed query packet
      client.query("INSERT INTO wire_lz4_tab VALUES (1, 'alpha'), (2, 'beta')")
      // client-streamed Data blocks, compressed both directions
      val schema = StructType(Seq(
        StructField("a", IntegerType), StructField("s", StringType)))
      client.insertStream("INSERT INTO wire_lz4_tab FORMAT Native", schema,
        Seq(Seq(Row(3, "gamma"), Row(4, null))))

      val got = client.rows("SELECT a, s FROM wire_lz4_tab ORDER BY a")
      assert(got(0).values === Vector(1, 2, 3, 4))
      assert(got(1).values === Vector("alpha", "beta", "gamma", null))

      // a result wide enough to span the long (>=128B) CityHash path
      val wide = client.rows(
        "SELECT id, repeat('x', 400) AS pad FROM range(50) ORDER BY id")
      assert(wide(0).values.length === 50)
      assert(wide(1).values.head === "x" * 400)
      client.query("DROP TABLE wire_lz4_tab")
    } finally {
      client.close()
      server.stop()
    }
  }
}
