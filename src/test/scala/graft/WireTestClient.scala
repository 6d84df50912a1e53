package graft

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.server.ChProto

/** Shared minimal CH-native test client (the client half of the framing in
  * crates/runtime/src/ch/messages.rs:234-340) used by the wire specs.
  * Failures surface as exceptions, which the calling spec reports.
  * With `compression = true` every query asks for (and every data block
  * travels as) LZ4+CityHash compressed frames, both directions.
  */
final class WireTestClient(port: Int, compression: Boolean = false) {
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
    require(code == ChProto.Server.Hello, s"expected server hello, got $code")
    val name = ChProto.readStr(in)
    ChProto.readVarint(in); ChProto.readVarint(in)
    val rev = ChProto.readVarint(in)
    ChProto.readStr(in); ChProto.readStr(in); ChProto.readVarint(in)
    (name, rev)
  }

  def ping(): Boolean = {
    ChProto.writeVarint(out, ChProto.Client.Ping); out.flush()
    ChProto.readVarint(in) == ChProto.Server.Pong
  }

  private def sendQueryPacket(sql: String,
                              settings: Seq[(String, String)] = Nil): Unit = {
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
    // settings as STRINGS_WITH_FLAGS triples, empty-name terminated
    settings.foreach { case (name, value) =>
      ChProto.writeStr(out, name)
      ChProto.writeVarint(out, 0) // flags
      ChProto.writeStr(out, value)
    }
    ChProto.writeStr(out, "") // settings terminator
    ChProto.writeVarint(out, 2) // stage: complete
    ChProto.writeVarint(out, if (compression) 1 else 0)
    ChProto.writeStr(out, sql)
    out.flush()
  }

  /** Send a Query packet; gather data blocks until EndOfStream. */
  def query(sql: String,
            settings: Seq[(String, String)] = Nil): Seq[ChProto.WireBlock] =
    queryWithProgress(sql, settings)._1

  /** Like [[query]] but also returns the cumulative row counts carried by
    * the server's Progress packets, in arrival order.
    */
  def queryWithProgress(sql: String, settings: Seq[(String, String)] = Nil)
  : (Seq[ChProto.WireBlock], Seq[Long]) = {
    sendQueryPacket(sql, settings)
    val blocks = Vector.newBuilder[ChProto.WireBlock]
    val progress = Vector.newBuilder[Long]
    var done = false
    while (!done) {
      ChProto.readVarint(in) match {
        case ChProto.Server.Data =>
          blocks += ChProto.readDataBlock(in, compressed = compression)
        case ChProto.Server.Progress =>
          progress += ChProto.readProgress(in)._1
        case ChProto.Server.EndOfStream => done = true
        case ChProto.Server.Exception =>
          sys.error(s"server exception ${readExceptionBody()}")
        case other => sys.error(s"unexpected server packet $other")
      }
    }
    (blocks.result(), progress.result())
  }

  /** First non-empty result block's column values, or empty. */
  def rows(sql: String): Vector[ChProto.WireColumn] =
    query(sql).find(_.nRows > 0).map(_.columns).getOrElse(Vector.empty)

  /** Single scalar result cell. */
  def scalar(sql: String): Any = rows(sql).head.values.head

  /** Decode an Exception packet body (code already consumed). */
  private def readExceptionBody(): String = {
    ChProto.readBytes(in, 4)
    val name = ChProto.readStr(in)
    val msg = ChProto.readStr(in)
    ChProto.readStr(in); ChProto.readVarint(in)
    s"$name: $msg"
  }

  /** Shared INSERT preamble: send the query, read the table-structure
    * header block, stream the row batches (no terminator).
    */
  private def streamBlocks(sql: String, schema: StructType,
                           batches: Seq[Seq[Row]]): ChProto.WireBlock = {
    sendQueryPacket(sql)
    val first = ChProto.readVarint(in)
    require(first == ChProto.Server.Data, s"expected header block, got $first")
    val header = ChProto.readDataBlock(in, compressed = compression)
    // a conforming client frames columns the way the header declared
    // them — LowCardinality columns go back with dict-block framing
    val declared = headerDeclared(header)
    batches.foreach(rows =>
      ChProto.writeDataBlock(out, schema, rows, ChProto.Client.Data,
        compress = compression, declared = declared))
    header
  }

  private def headerDeclared(header: ChProto.WireBlock)
  : Int => Option[graft.types.BqlType] = {
    val lcByPos = header.columns.map(c =>
      graft.types.BqlType.parse(c.chType).toOption.collect {
        case lc: graft.types.BqlType.LowCardinality => lc
      })
    i => if (i >= 0 && i < lcByPos.length) lcByPos(i) else None
  }

  /** INSERT with client-streamed Data blocks (DataEODPInsertQuery stage). */
  def insertStream(sql: String, schema: StructType,
                   batches: Seq[Seq[Row]]): ChProto.WireBlock = {
    val header = streamBlocks(sql, schema, batches)
    ChProto.writeDataBlock(out, schema, Seq.empty, ChProto.Client.Data,
      compress = compression, declared = headerDeclared(header))
    out.flush()
    val eos = ChProto.readVarint(in)
    require(eos == ChProto.Server.EndOfStream, s"expected EndOfStream, got $eos")
    header
  }

  /** Streamed INSERT aborted with a Cancel packet instead of the empty
    * terminator block — the Ctrl+C path. The server must acknowledge with
    * EndOfStream and keep the connection's framing intact.
    */
  def insertStreamCancel(sql: String, schema: StructType,
                         batches: Seq[Seq[Row]]): Unit = {
    streamBlocks(sql, schema, batches)
    ChProto.writeVarint(out, ChProto.Client.Cancel)
    out.flush()
    val eos = ChProto.readVarint(in)
    require(eos == ChProto.Server.EndOfStream,
      s"expected EndOfStream after Cancel, got $eos")
  }

  /** Streamed INSERT whose blocks the server is expected to REJECT at
    * apply time (well-formed wire data, bad content): streams everything
    * incl. the terminator, then returns the server's Exception message.
    * The connection must stay in sync afterwards.
    */
  def insertStreamExpectError(sql: String, schema: StructType,
                              batches: Seq[Seq[Row]]): String = {
    streamBlocks(sql, schema, batches)
    ChProto.writeDataBlock(out, schema, Seq.empty, ChProto.Client.Data,
      compress = compression)
    out.flush()
    val code = ChProto.readVarint(in)
    require(code == ChProto.Server.Exception,
      s"expected Exception after rejected INSERT, got $code")
    readExceptionBody()
  }

  /** Streamed INSERT followed by an UNDECODABLE Data block (a block-info
    * field code no decoder accepts). The server cannot resync mid-block
    * and must sever the connection without answering; returns true if the
    * next read hit EOF (clean close, no Exception packet).
    */
  def insertStreamGarbage(sql: String, schema: StructType,
                          batches: Seq[Seq[Row]] = Nil): Boolean = {
    streamBlocks(sql, schema, batches)
    ChProto.writeVarint(out, ChProto.Client.Data)
    ChProto.writeStr(out, "") // temporary table name
    ChProto.writeVarint(out, 99L) // unknown block-info field -> decode error
    out.flush()
    try { ChProto.readVarint(in); false }
    catch { case _: java.io.EOFException => true }
  }

  def close(): Unit = sock.close()
}
