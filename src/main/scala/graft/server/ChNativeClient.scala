package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StructField, StructType}

import graft.types.BqlType

/** ClickHouse-native protocol client — the transport behind `remote(...)`
  * federation, mirroring the reference's pooled CH client
  * (crates/runtime/src/read.rs:57-105 pool, :151-228 remote_query fan-out;
  * crates/engine/src/remote.rs). One client = one connection; reuse goes
  * through [[ChNativeClient.withClient]], which keeps a per-process pool
  * keyed by (address, user, password) exactly like the reference's
  * `POOLS` map. The LZ4+CityHash compressed transport is on by default,
  * as the reference's pools configure (read.rs:75 `with_compression`).
  */
final class ChNativeClient(host: String, port: Int,
                           user: String = "default", password: String = "",
                           compression: Boolean = true) extends AutoCloseable {
  private val sock = new Socket(host, port)
  private val in = new BufferedInputStream(sock.getInputStream)
  private val out = new BufferedOutputStream(sock.getOutputStream)
  @volatile private[server] var broken = false

  // handshake (messages.rs:234-269)
  locally {
    ChProto.writeVarint(out, ChProto.Client.Hello)
    ChProto.writeStr(out, "graft-remote")
    ChProto.writeVarint(out, ChProto.VersionMajor)
    ChProto.writeVarint(out, ChProto.VersionMinor)
    ChProto.writeVarint(out, ChProto.Revision)
    ChProto.writeStr(out, "") // database: resolve via qualified names
    ChProto.writeStr(out, user)
    ChProto.writeStr(out, password)
    out.flush()
    val code = ChProto.readVarint(in)
    if (code == ChProto.Server.Exception) throw readException()
    require(code == ChProto.Server.Hello, s"expected server hello, got $code")
    ChProto.readStr(in)
    ChProto.readVarint(in); ChProto.readVarint(in); ChProto.readVarint(in)
    ChProto.readStr(in); ChProto.readStr(in); ChProto.readVarint(in)
  }

  def ping(): Boolean = {
    ChProto.writeVarint(out, ChProto.Client.Ping); out.flush()
    ChProto.readVarint(in) == ChProto.Server.Pong
  }

  private def sendQueryPacket(sql: String): Unit = {
    ChProto.writeVarint(out, ChProto.Client.Query)
    ChProto.writeStr(out, "graft-remote-query")
    ChProto.writeVarint(out, 1) // kind: initial query
    ChProto.writeStr(out, ""); ChProto.writeStr(out, ""); ChProto.writeStr(out, "")
    ChProto.writeVarint(out, 1) // interface: tcp
    ChProto.writeStr(out, ""); ChProto.writeStr(out, "")
    ChProto.writeStr(out, "graft-remote")
    ChProto.writeVarint(out, ChProto.VersionMajor)
    ChProto.writeVarint(out, ChProto.VersionMinor)
    ChProto.writeVarint(out, ChProto.Revision)
    ChProto.writeStr(out, "") // quota key
    ChProto.writeVarint(out, 0) // client patch
    ChProto.writeStr(out, "") // settings: empty
    ChProto.writeVarint(out, 2) // stage: complete
    ChProto.writeVarint(out, if (compression) 1 else 0)
    ChProto.writeStr(out, sql)
    out.flush()
  }

  private def readException(): RuntimeException = {
    val codeBytes = ChProto.readBytes(in, 4)
    val code = (codeBytes(0) & 0xff) | ((codeBytes(1) & 0xff) << 8) |
      ((codeBytes(2) & 0xff) << 16) | ((codeBytes(3) & 0xff) << 24)
    val name = ChProto.readStr(in)
    val msg = ChProto.readStr(in)
    ChProto.readStr(in); ChProto.readVarint(in)
    new RuntimeException(s"remote server exception [$code] $name: $msg")
  }

  /** Run a query, streaming result blocks lazily off the socket. The
    * iterator MUST be fully consumed (EndOfStream read) before the client
    * can be reused; abandoning it mid-stream marks the connection broken.
    */
  def queryBlocks(sql: String): Iterator[ChProto.WireBlock] = {
    sendQueryPacket(sql)
    broken = true // healthy again only once EndOfStream is consumed
    new Iterator[ChProto.WireBlock] {
      private var nextBlock: ChProto.WireBlock = _
      private var done = false
      private def advance(): Unit = {
        while (nextBlock == null && !done) {
          ChProto.readVarint(in) match {
            case ChProto.Server.Data =>
              nextBlock = ChProto.readDataBlock(in, compressed = compression)
            case ChProto.Server.Progress =>
              ChProto.readProgress(in) // informational; keep draining
            case ChProto.Server.EndOfStream => done = true; broken = false
            case ChProto.Server.Exception => throw readException()
            case other => sys.error(s"unexpected server packet $other")
          }
        }
      }
      def hasNext: Boolean = { advance(); nextBlock != null }
      def next(): ChProto.WireBlock = {
        advance()
        val b = nextBlock; nextBlock = null
        if (b == null) throw new NoSuchElementException("past EndOfStream")
        b
      }
    }
  }

  /** Run a query and drain everything (commands / small results). */
  def query(sql: String): Vector[ChProto.WireBlock] = queryBlocks(sql).toVector

  /** Result schema of `sql` from the server's leading header block. */
  def schemaOf(sql: String): StructType = {
    val blocks = query(sql)
    require(blocks.nonEmpty, s"no header block for: $sql")
    StructType(blocks.head.columns.map { c =>
      val t = BqlType.parse(c.chType).fold(e => sys.error(e), identity)
      val (nullable, base) = t match {
        case BqlType.Nullable(inner) => (true, inner)
        case other => (false, other)
      }
      StructField(c.name, base.sparkType, nullable)
    })
  }

  /** INSERT with client-streamed Data blocks (the reference's
    * DataEODPInsertQuery stage): send the INSERT header query, read the
    * table-structure block, stream row batches, terminate with the empty
    * block, await EndOfStream. Returns rows written.
    */
  def insertStream(sql: String, schema: StructType, rows: Iterator[Row],
                   batchRows: Int = 8192): Long = {
    sendQueryPacket(sql)
    broken = true
    val first = ChProto.readVarint(in)
    if (first == ChProto.Server.Exception) throw readException()
    require(first == ChProto.Server.Data, s"expected header block, got $first")
    val header = ChProto.readDataBlock(in, compressed = compression)
    // honor the server's declared LowCardinality AND Enum columns: a
    // conforming server expects LC streamed back with the dict-block
    // framing its header advertised, and Enum as base ints with the
    // entries metadata (shipping an Enum column as plain String would be
    // rejected by a real ClickHouse server — r19, write-side federation)
    val lcByPos: Vector[Option[BqlType]] = header.columns.map(c =>
      BqlType.parse(c.chType).toOption.collect {
        case lc: BqlType.LowCardinality => lc
        case en: BqlType.Enum => en
        case ne @ BqlType.Nullable(_: BqlType.Enum) => ne
      })
    val declared: Int => Option[BqlType] =
      i => if (i >= 0 && i < lcByPos.length) lcByPos(i) else None
    var n = 0L
    rows.grouped(batchRows).foreach { batch =>
      ChProto.writeDataBlock(out, schema, batch, ChProto.Client.Data,
        compress = compression, declared = declared)
      n += batch.length
    }
    // INTEROP NOTE (ADVICE r11): the zero-row terminator frames any LC
    // column as real ClickHouse does — u64 keys-version prefix only, no
    // flags word. The reference dialect diverges BOTH ways here: its
    // decoder (blocks.rs:480-531) reads the flags u64 unconditionally
    // even for zero rows, and its own zero-row writes omit the prefix
    // entirely (types.rs:180-192) — so no framing satisfies both peers
    // and we resolve in real CH's favor. Streaming an LC-columned INSERT
    // into a reference-dialect server would desync at the terminator;
    // remote() targets speaking that dialect must not declare LC columns
    // (the reference itself maps LC to raw UInt32 on query, so in
    // practice its tables never advertise LC over the wire).
    ChProto.writeDataBlock(out, schema, Seq.empty, ChProto.Client.Data,
      compress = compression, declared = declared)
    out.flush()
    val eos = ChProto.readVarint(in)
    if (eos == ChProto.Server.Exception) throw readException()
    require(eos == ChProto.Server.EndOfStream, s"expected EndOfStream, got $eos")
    broken = false
    n
  }

  def close(): Unit = { broken = true; sock.close() }
}

object ChNativeClient {

  /** `ch://host[:port][,host2[:port2]...]` → shard addresses (the
    * reference's comma-separated fan-out list, read.rs:151-180).
    */
  def parseAddrs(url: String): Seq[(String, Int)] = {
    require(url.startsWith("ch://"), s"not a ch:// address: $url")
    url.stripPrefix("ch://").split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      .map { a =>
        a.split(':') match {
          case Array(h) => (h, 9000)
          case Array(h, p) => (h, p.toInt)
          case _ => throw new IllegalArgumentException(s"bad address: $a")
        }
      }
  }

  private type Key = (String, Int, String, String)
  private val pool = mutable.Map.empty[Key, mutable.ArrayDeque[ChNativeClient]]
  private val MaxIdlePerKey = 4

  /** Borrow a pooled connection (or dial a new one), run `f`, return the
    * connection to the pool if it is still healthy — the reference's
    * get-or-create pool pattern (read.rs:57-105). Broken or surplus
    * connections are closed, not returned.
    */
  def withClient[T](host: String, port: Int, user: String = "default",
                    password: String = "", compression: Boolean = true)
                   (f: ChNativeClient => T): T = {
    val key = (host, port, user, password)
    val borrowed = pool.synchronized {
      pool.get(key).flatMap(q => if (q.nonEmpty) Some(q.removeHead()) else None)
    }
    val client = borrowed.getOrElse(
      new ChNativeClient(host, port, user, password, compression))
    var ok = false
    try {
      val r = f(client)
      ok = !client.broken
      r
    } finally {
      if (ok) {
        val returned = pool.synchronized {
          val q = pool.getOrElseUpdate(key, mutable.ArrayDeque.empty)
          if (q.length < MaxIdlePerKey) { q.append(client); true } else false
        }
        if (!returned) client.close()
      } else client.close()
    }
  }

  /** Drop all idle pooled connections (tests / shutdown). */
  def clearPool(): Unit = pool.synchronized {
    pool.values.foreach(_.foreach(_.close()))
    pool.clear()
  }
}
