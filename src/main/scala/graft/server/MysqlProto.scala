package graft.server

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** MySQL client/server protocol primitives (text protocol, 4.1+), the
  * transport behind the reference's second front-end
  * (crates/runtime/src/mysql/mod.rs:102-360 over the crates/server_mysql
  * shim): 3-byte-length+sequence packet framing, length-encoded integers
  * and strings, HandshakeV10 / HandshakeResponse41, OK/ERR/EOF packets,
  * ColumnDefinition41 and text resultset rows. Type mapping mirrors
  * `arrow_type_to_mysql_type` (mysql/mod.rs:346-360).
  */
object MysqlProto {

  // command codes
  val ComQuit = 0x01
  val ComInitDb = 0x02
  val ComQuery = 0x03
  val ComPing = 0x0e
  val ComStmtPrepare = 0x16
  val ComStmtExecute = 0x17
  val ComStmtClose = 0x19
  val ComStmtReset = 0x1a

  // capability flags (the subset we speak)
  val ClientLongPassword = 0x1L
  val ClientConnectWithDb = 0x8L
  val ClientCompress = 0x20L
  val ClientProtocol41 = 0x200L
  val ClientSecureConnection = 0x8000L
  val ClientPluginAuth = 0x80000L

  /** MySQL's compressed-protocol threshold: envelopes smaller than this
    * ship raw (uncompressed-length field = 0), matching real servers.
    */
  val MinCompressLength = 50

  /** Reader half of the MySQL compressed protocol (engaged after a
    * successful handshake when the client set CLIENT_COMPRESS): each
    * envelope is `u24 compressed-length, u8 seq, u24 uncompressed-length`
    * then the payload — zlib-deflated when uncompressed-length > 0, raw
    * when 0. The inner byte stream is the ordinary packet stream.
    */
  final class CompressedIn(raw: java.io.InputStream)
      extends java.io.InputStream {
    private var buf: Array[Byte] = Array.emptyByteArray
    private var pos = 0
    /** Sequence id of the last envelope read — the response's compressed
      * sequence continues from it (MySQL resets per command).
      */
    @volatile var lastSeq: Int = 0
    private def fill(): Boolean = {
      val h = raw.readNBytes(7)
      if (h.length < 7) return false
      val clen = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
      lastSeq = h(3) & 0xff
      val ulen = (h(4) & 0xff) | ((h(5) & 0xff) << 8) | ((h(6) & 0xff) << 16)
      val payload = raw.readNBytes(clen)
      if (payload.length < clen) return false
      buf =
        if (ulen == 0) payload
        else {
          val inf = new java.util.zip.Inflater()
          inf.setInput(payload)
          val out = new Array[Byte](ulen)
          var off = 0
          while (off < ulen && !inf.finished())
            off += inf.inflate(out, off, ulen - off)
          inf.end()
          require(off == ulen,
            s"compressed envelope inflated to $off of declared $ulen bytes")
          out
        }
      pos = 0
      true
    }
    override def read(): Int = {
      while (pos >= buf.length) if (!fill()) return -1
      val b = buf(pos) & 0xff; pos += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (pos >= buf.length) if (!fill()) return -1
      val n = math.min(len, buf.length - pos)
      System.arraycopy(buf, pos, b, off, n)
      pos += n
      n
    }
  }

  /** Writer half: buffers ordinary packet bytes; flush() wraps everything
    * pending into compressed envelopes (deflated past
    * [[MinCompressLength]], raw below it or when deflate doesn't shrink).
    */
  final class CompressedOut(raw: java.io.OutputStream)
      extends java.io.OutputStream {
    private val pending = new java.io.ByteArrayOutputStream()
    /** Next envelope sequence — the serve loop sets it to the command
      * envelope's seq + 1 before responding.
      */
    @volatile var seq: Int = 0
    override def write(b: Int): Unit = pending.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      pending.write(b, off, len)
    override def flush(): Unit = {
      val data = pending.toByteArray
      pending.reset()
      var i = 0
      while (i < data.length) {
        val n = math.min(data.length - i, 0xffffff)
        val chunk = java.util.Arrays.copyOfRange(data, i, i + n)
        val deflated: Option[Array[Byte]] =
          if (chunk.length < MinCompressLength) None
          else {
            val d = new java.util.zip.Deflater()
            d.setInput(chunk); d.finish()
            val out = new java.io.ByteArrayOutputStream(chunk.length)
            val tmp = new Array[Byte](8192)
            while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
            d.end()
            Some(out.toByteArray).filter(_.length < chunk.length)
          }
        val (payload, ulen) = deflated.map((_, chunk.length)).getOrElse((chunk, 0))
        raw.write(payload.length & 0xff)
        raw.write((payload.length >>> 8) & 0xff)
        raw.write((payload.length >>> 16) & 0xff)
        raw.write(seq & 0xff)
        seq += 1
        raw.write(ulen & 0xff)
        raw.write((ulen >>> 8) & 0xff)
        raw.write((ulen >>> 16) & 0xff)
        raw.write(payload)
        i += n
      }
      raw.flush()
    }
  }

  // MySQL column type codes (mysql/mod.rs:346-360 target set)
  val TypeTiny = 0x01
  val TypeShort = 0x02
  val TypeLong = 0x03
  val TypeFloat = 0x04
  val TypeDouble = 0x05
  val TypeLonglong = 0x08
  val TypeDate = 0x0a
  val TypeDatetime = 0x0c
  val TypeVarchar = 0xfd
  val TypeNewDecimal = 0xf6

  // ---- packet framing -------------------------------------------------
  /** Largest single-packet payload; longer logical payloads travel as
    * 0xffffff-byte packets plus a terminating short (possibly empty) one,
    * per the protocol's packet-splitting rules.
    */
  val MaxPacket = 0xffffff

  /** Read one logical payload, reassembling split packets: every
    * exactly-0xffffff packet is followed by a continuation.
    */
  def readPacket(in: InputStream): (Int, Array[Byte]) = {
    val buf = new java.io.ByteArrayOutputStream()
    var seq = 0
    var more = true
    while (more) {
      val hdr = readN(in, 4)
      val len = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16)
      seq = hdr(3) & 0xff
      buf.write(readN(in, len))
      more = len == MaxPacket
    }
    (seq, buf.toByteArray)
  }

  /** Write one logical payload, splitting at 0xffffff bytes (a large text
    * document row overflows the 3-byte length field otherwise — the length
    * must never be masked down silently). Returns the next sequence id.
    */
  def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Int = {
    var off = 0
    var s = seq
    var more = true
    while (more) {
      val n = math.min(MaxPacket, payload.length - off)
      out.write(n & 0xff)
      out.write((n >>> 8) & 0xff)
      out.write((n >>> 16) & 0xff)
      out.write(s & 0xff)
      out.write(payload, off, n)
      off += n
      s += 1
      more = n == MaxPacket // a full packet promises a continuation
    }
    s
  }

  def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"expected $n bytes")
      off += r
    }
    buf
  }

  // ---- byte-buffer builders -------------------------------------------
  final class Out {
    private val buf = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Out = { buf.write(v & 0xff); this }
    def u16(v: Int): Out = { u8(v); u8(v >>> 8) }
    def u24(v: Int): Out = { u8(v); u8(v >>> 8); u8(v >>> 16) }
    def u32(v: Long): Out = { u8(v.toInt); u8((v >>> 8).toInt); u8((v >>> 16).toInt); u8((v >>> 24).toInt) }
    def u64(v: Long): Out = { u32(v); u32(v >>> 32) }
    def bytes(b: Array[Byte]): Out = { buf.write(b); this }
    def nulStr(s: String): Out = { bytes(s.getBytes(UTF_8)); u8(0) }
    def lenencInt(v: Long): Out =
      if (v < 251) u8(v.toInt)
      else if (v < (1L << 16)) { u8(0xfc); u16(v.toInt) }
      else if (v < (1L << 24)) { u8(0xfd); u24(v.toInt) }
      else { u8(0xfe); u32(v); u32(v >>> 32) }
    def lenencStr(s: String): Out = {
      val b = s.getBytes(UTF_8); lenencInt(b.length.toLong); bytes(b)
    }
    def result(): Array[Byte] = buf.toByteArray
  }

  final class In(payload: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = payload(pos) & 0xff; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def bytes(n: Int): Array[Byte] = {
      val b = java.util.Arrays.copyOfRange(payload, pos, pos + n); pos += n; b
    }
    def nulStr(): String = {
      val end = payload.indexOf(0.toByte, pos)
      val s = new String(payload, pos, end - pos, UTF_8); pos = end + 1; s
    }
    def lenencInt(): Long = u8() match {
      case 0xfb => -1 // NULL marker in row context
      case 0xfc => u16().toLong
      case 0xfd => u8().toLong | (u8().toLong << 8) | (u8().toLong << 16)
      case 0xfe => u32() | (u32() << 32)
      case v => v.toLong
    }
    def lenencStr(): String = {
      val n = lenencInt()
      if (n < 0) null else new String(bytes(n.toInt), UTF_8)
    }
    def remaining: Int = payload.length - pos
    def rest(): Array[Byte] = bytes(remaining)
  }

  // ---- standard packets ----------------------------------------------
  def okPacket(): Array[Byte] =
    new Out().u8(0x00).lenencInt(0).lenencInt(0).u16(0x0002).u16(0).result()

  def errPacket(errno: Int, msg: String): Array[Byte] =
    new Out().u8(0xff).u16(errno).u8('#').bytes("HY000".getBytes(UTF_8))
      .bytes(msg.getBytes(UTF_8)).result()

  def eofPacket(): Array[Byte] =
    new Out().u8(0xfe).u16(0).u16(0x0002).result()

  def isEof(payload: Array[Byte]): Boolean =
    payload.nonEmpty && (payload(0) & 0xff) == 0xfe && payload.length < 9

  // ---- resultset encoding --------------------------------------------
  /** (type code, binary charset) per Spark output type — the same target
    * set as the reference (mysql/mod.rs:346-360; unsigned widenings land
    * on the signed wire type of their widened representation).
    */
  def mysqlType(dt: DataType): Int = dt match {
    case ByteType => TypeTiny
    case ShortType => TypeShort
    case IntegerType => TypeLong
    case LongType => TypeLonglong
    case FloatType => TypeFloat
    case DoubleType => TypeDouble
    case DateType => TypeDate
    case TimestampType => TypeDatetime
    case _: DecimalType => TypeNewDecimal
    case _ => TypeVarchar
  }

  def columnDefinition(name: String, dt: DataType): Array[Byte] =
    new Out()
      .lenencStr("def").lenencStr("").lenencStr("").lenencStr("")
      .lenencStr(name).lenencStr(name)
      .lenencInt(0x0c) // fixed-length fields below
      .u16(33) // utf8_general_ci
      .u32(255L) // display length
      .u8(mysqlType(dt))
      .u16(0) // flags
      .u8(if (dt.isInstanceOf[DecimalType]) 2 else 0) // decimals
      .u16(0) // filler
      .result()

  // ---- prepared statements (binary protocol) ---------------------------

  /** COM_STMT_PREPARE_OK header. numCols = 0 defers the result schema to
    * the EXECUTE response's own resultset (every driver re-reads it there;
    * the schema of a parameterized query is not generally knowable before
    * the parameters are bound).
    */
  def stmtPrepareOk(stmtId: Int, numCols: Int, numParams: Int): Array[Byte] =
    new Out().u8(0x00).u32(stmtId.toLong).u16(numCols).u16(numParams)
      .u8(0).u16(0).result()

  /** One COM_STMT_EXECUTE binary parameter, decoded per its client-bound
    * type and rendered as a SQL literal (the reference's server_mysql shim
    * defines exactly these frames — crates/server_mysql/src/lib.rs:160-180
    * ParamValue/Value — but its runtime never implemented the decode).
    * The low byte is the MySQL type code; bit 15 of the 2-byte on-wire
    * type field is the UNSIGNED flag.
    */
  def decodeBinaryParam(p: In, tpe: Int): String = {
    val unsigned = (tpe & 0x8000) != 0
    def sq(s: String): String =
      "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
    (tpe & 0xff) match {
      case 0x06 => "NULL" // MYSQL_TYPE_NULL
      case 0x01 => val v = p.u8(); (if (unsigned) v else v.toByte.toInt).toString
      case 0x02 => val v = p.u16(); (if (unsigned) v else v.toShort.toInt).toString
      case 0x03 => val v = p.u32(); (if (unsigned) v else v.toInt.toLong).toString
      case 0x08 =>
        val v = p.u32() | (p.u32() << 32)
        if (unsigned && v < 0) java.lang.Long.toUnsignedString(v) else v.toString
      case 0x04 =>
        val f = java.lang.Float.intBitsToFloat(p.u32().toInt)
        // keep the float's own short decimal rendering when finite
        // (toDouble would stretch 0.1f to 0.10000000149011612)
        if (java.lang.Float.isFinite(f)) f.toString
        else floatLiteral(f.toDouble)
      case 0x05 =>
        floatLiteral(java.lang.Double.longBitsToDouble(p.u32() | (p.u32() << 32)))
      case 0x0a => // DATE: length-prefixed y/m/d
        val n = p.u8()
        if (n == 0) "DATE '1970-01-01'"
        else {
          val y = p.u16(); val m = p.u8(); val d = p.u8()
          if (n > 4) p.bytes(n - 4) // tolerate over-long encodings
          f"DATE '$y%04d-$m%02d-$d%02d'"
        }
      case 0x07 | 0x0c => // TIMESTAMP / DATETIME: 0, 4, 7 or 11 bytes
        val n = p.u8()
        if (n == 0) "TIMESTAMP '1970-01-01 00:00:00'"
        else {
          val y = p.u16(); val m = p.u8(); val d = p.u8()
          val (h, mi, s) = if (n >= 7) (p.u8(), p.u8(), p.u8()) else (0, 0, 0)
          val us = if (n >= 11) p.u32() else 0L
          val frac = if (us > 0) f".$us%06d" else ""
          f"TIMESTAMP '$y%04d-$m%02d-$d%02d $h%02d:$mi%02d:$s%02d$frac'"
        }
      case 0x0f | 0xf6 | 0xfc | 0xfd | 0xfe | 0xf7 =>
        // VARCHAR / NEWDECIMAL / BLOB / VAR_STRING / STRING / ENUM:
        // lenenc payload; decimals arrive as digit strings and pass
        // through unquoted-safe as quoted literals would coerce — CH and
        // Spark both cast '1.5' in numeric contexts, but a bare literal
        // is cleaner for decimals
        val s = p.lenencStr()
        if ((tpe & 0xff) == 0xf6 && s != null && s.matches("-?[0-9]+(\\.[0-9]+)?"))
          s
        else sq(String.valueOf(s))
      case other => throw new IllegalArgumentException(
        f"unsupported binary parameter type 0x$other%02x")
    }
  }

  /** Binary-protocol resultset row (COM_STMT_EXECUTE response): 0x00
    * header, NULL bitmap (offset 2), then each non-null value in its
    * type's binary encoding.
    */
  def binaryRow(r: Row): Array[Byte] = {
    val n = r.length
    val o = new Out().u8(0x00)
    val bitmap = new Array[Byte]((n + 7 + 2) / 8)
    var i = 0
    while (i < n) {
      if (r.isNullAt(i)) {
        val b = i + 2
        bitmap(b / 8) = (bitmap(b / 8) | (1 << (b % 8))).toByte
      }
      i += 1
    }
    o.bytes(bitmap)
    i = 0
    while (i < n) {
      if (!r.isNullAt(i)) r.schema.fields(i).dataType match {
        case ByteType => o.u8(r.getByte(i).toInt)
        case ShortType => o.u16(r.getShort(i).toInt)
        case IntegerType => o.u32(r.getInt(i).toLong & 0xffffffffL)
        case LongType => o.u64(r.getLong(i))
        case FloatType => o.u32(
          java.lang.Float.floatToIntBits(r.getFloat(i)).toLong & 0xffffffffL)
        case DoubleType => o.u64(
          java.lang.Double.doubleToLongBits(r.getDouble(i)))
        case DateType =>
          val d = r.getDate(i).toLocalDate
          o.u8(4).u16(d.getYear).u8(d.getMonthValue).u8(d.getDayOfMonth)
        case TimestampType =>
          val t = r.getTimestamp(i).toLocalDateTime
          val us = t.getNano / 1000
          if (us == 0)
            o.u8(7).u16(t.getYear).u8(t.getMonthValue).u8(t.getDayOfMonth)
              .u8(t.getHour).u8(t.getMinute).u8(t.getSecond)
          else
            o.u8(11).u16(t.getYear).u8(t.getMonthValue).u8(t.getDayOfMonth)
              .u8(t.getHour).u8(t.getMinute).u8(t.getSecond).u32(us.toLong)
        case _ => // DECIMAL, VARCHAR and everything stringly: lenenc
          o.lenencStr(String.valueOf(r.get(i)))
      }
      i += 1
    }
    o.result()
  }

  /** Count `?` placeholders outside quoted regions. */
  def countPlaceholders(sql: String): Int = splitOnPlaceholders(sql).size - 1

  /** The SQL split at each top-level `?` — substitution is a mkString
    * with the rendered literals as separators. Quote-aware (' " ` with ''
    * doubling), comment-aware (-- to EOL).
    */
  /** A FLOAT/DOUBLE param as a SQL literal: non-finite values render as
    * bare `NaN`/`Infinity` tokens that parse as identifiers — splice the
    * CAST literal form instead (ADVICE r17).
    */
  private def floatLiteral(v: Double): String =
    if (java.lang.Double.isNaN(v)) "CAST('NaN' AS DOUBLE)"
    else if (v == Double.PositiveInfinity) "CAST('Infinity' AS DOUBLE)"
    else if (v == Double.NegativeInfinity) "CAST('-Infinity' AS DOUBLE)"
    else v.toString

  def splitOnPlaceholders(sql: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var q: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) {
        cur += c
        // MySQL string literals escape with backslash: a \' must not
        // close the quote (a ? after it would otherwise read as a marker)
        if (c == '\\' && i + 1 < sql.length) { cur += sql.charAt(i + 1); i += 1 }
        else if (c == q) q = 0
      } else c match {
        case '\'' | '"' | '`' => q = c; cur += c
        case '-' if i + 1 < sql.length && sql.charAt(i + 1) == '-' =>
          val eol = sql.indexOf('\n', i)
          val end = if (eol < 0) sql.length else eol
          cur ++= sql.substring(i, end); i = end - 1
        // MySQL's other comment forms hide '?' too: '#' to end of line
        // and '/* */' blocks (ADVICE r17 — a marker inside either would
        // shift every subsequent binding)
        case '#' =>
          val eol = sql.indexOf('\n', i)
          val end = if (eol < 0) sql.length else eol
          cur ++= sql.substring(i, end); i = end - 1
        case '/' if i + 1 < sql.length && sql.charAt(i + 1) == '*' =>
          val close = sql.indexOf("*/", i + 2)
          val end = if (close < 0) sql.length else close + 2
          cur ++= sql.substring(i, end); i = end - 1
        case '?' => parts += cur.result(); cur.clear()
        case other => cur += other
      }
      i += 1
    }
    parts += cur.result()
    parts.toSeq
  }

  /** Text-protocol value: lenenc string, NULL = 0xfb. */
  def textValue(r: Row, i: Int): Array[Byte] =
    if (r.isNullAt(i)) Array(0xfb.toByte)
    else {
      val s = r.schema.fields(i).dataType match {
        case TimestampType =>
          // "YYYY-MM-DD HH:MM:SS[.ffffff]" per the text protocol
          r.getTimestamp(i).toString.stripSuffix(".0")
        case _ => String.valueOf(r.get(i))
      }
      new Out().lenencStr(s).result()
    }
}
