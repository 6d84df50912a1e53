package graft.server

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.math.BigInteger

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.types.BqlType

/** ClickHouse native-protocol wire codec (uncompressed), mirroring the
  * reference's framing:
  *   - packet codes: crates/runtime/src/ch/protocol.rs:12-21 (client) and
  *     :143-156 (server);
  *   - varint/length-prefixed strings: crates/runtime/src/ch/codecs.rs:86-88;
  *   - block layout (block info field pairs, ncols/nrows, per-column
  *     name + type + body; Nullable null-map before values; String as
  *     varint-length values; Date u16 days; DateTime u32 seconds):
  *     crates/runtime/src/ch/blocks.rs:15-120,193-210,394-410;
  *   - exception packet: crates/runtime/src/ch/codecs.rs:91-98;
  *   - handshake constants: crates/runtime/src/ch/messages.rs:17-21.
  */
object ChProto {

  // packet codes (protocol.rs:12-21, :143-156)
  object Client {
    val Hello = 0L; val Query = 1L; val Data = 2L; val Cancel = 3L; val Ping = 4L
  }
  object Server {
    val Hello = 0L; val Data = 1L; val Exception = 2L; val Progress = 3L
    val Pong = 4L; val EndOfStream = 5L
  }

  /** Progress packet body (protocol.rs:147-152 lists the code; the field
    * layout is the CH wire's: read rows/bytes, total-rows estimate, and —
    * revision >= 54372 — written rows/bytes, all varints). The reference
    * never emits these; we do, so long streamed results are observably
    * alive instead of silent until EndOfStream.
    */
  def writeProgress(out: OutputStream, readRows: Long, readBytes: Long,
                    totalRows: Long = 0L): Unit = {
    writeVarint(out, Server.Progress)
    writeVarint(out, readRows)
    writeVarint(out, readBytes)
    writeVarint(out, totalRows)
    writeVarint(out, 0L) // written rows
    writeVarint(out, 0L) // written bytes
  }

  /** Skip a Progress packet body already identified by its code. */
  def readProgress(in: InputStream): (Long, Long) = {
    val rows = readVarint(in)
    val bytes = readVarint(in)
    readVarint(in); readVarint(in); readVarint(in)
    (rows, bytes)
  }

  val ServerName = "GraftSpark"
  val VersionMajor = 2026L
  val VersionMinor = 8L
  /** The reference pins 54405 (messages.rs:21) but then parses settings in
    * the strings format with a FIXME admitting it supports only that shape
    * (messages.rs:307-309: "client_tcp_protocol_version > 54429 ...
    * STRINGS_WITH_FLAGS : BINARY"). Real clients choose the settings
    * serialization by the SERVER's advertised revision, so advertising
    * 54405 while reading STRINGS_WITH_FLAGS would desync any conforming
    * client. 54429 is the lowest revision at which both wire shapes this
    * server implements are the spec shapes: settings as (name, flags,
    * value-string) triples (54429) and the 5-field Progress with written
    * rows/bytes (54420). Like the reference, clients older than the server
    * revision are rejected at Hello, so every accepted client speaks these
    * formats; nothing else in the Hello/Query/Data framing changed between
    * 54405 and 54429 (next client-info addition is opentelemetry at 54442,
    * interserver secret at 54441).
    */
  val Revision = 54429L
  val VersionPatch = 0L

  // ---- primitive codecs ----------------------------------------------
  def readVarint(in: InputStream): Long = {
    var shift = 0
    var v = 0L
    while (shift < 64) {
      val b = in.read()
      if (b < 0) throw new EOFException("varint")
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
    }
    v
  }

  def writeVarint(out: OutputStream, value: Long): Unit = {
    var v = value
    var go = true
    while (go) {
      val b = (v & 0x7f).toInt
      v = v >>> 7
      if (v == 0) { out.write(b); go = false }
      else out.write(b | 0x80)
    }
  }

  def readBytes(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"expected $n bytes")
      off += r
    }
    buf
  }

  def readStr(in: InputStream): String = {
    val n = readVarint(in).toInt
    new String(readBytes(in, n), "UTF-8")
  }

  def writeStr(out: OutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    writeVarint(out, b.length.toLong)
    out.write(b)
  }

  private def writeIntLe(out: OutputStream, v: Int, nBytes: Int): Unit = {
    var i = 0
    while (i < nBytes) { out.write((v >>> (8 * i)) & 0xff); i += 1 }
  }

  private def writeLongLe(out: OutputStream, v: Long, nBytes: Int): Unit = {
    var i = 0
    while (i < nBytes) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def readLongLe(in: InputStream, nBytes: Int): Long = {
    val b = readBytes(in, nBytes)
    var v = 0L
    var i = nBytes - 1
    while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
    v
  }

  // ---- block encode ---------------------------------------------------
  /** Wire CH type for an output column (unsigned widenings reverse-map to
    * signed CH types by design — fromSpark, SURVEY §1.2), with two wire
    * special cases: a column `isU64` proves to be the UInt64 widening goes
    * back out as a true u64; every other decimal wider than the reference's
    * 8-byte storage (aggregate headroom, e.g. sum → precision+10 — which
    * also lands on Decimal(20,0), so SHAPE matching alone would misdeclare
    * it and garble negatives) ships as String — lossless as text where a
    * 64-bit unscaled long would overflow.
    */
  def wireType(schema: StructType, i: Int, isU64: Int => Boolean): BqlType = {
    val f = schema.fields(i)
    val base = f.dataType match {
      case d: org.apache.spark.sql.types.DecimalType
          if d.precision == 20 && d.scale == 0 && isU64(i) => BqlType.UInt64
      case d: org.apache.spark.sql.types.DecimalType
          if d.precision > BqlType.MaxDecimalPrecision => BqlType.Str
      // Spark timestamps are MICROSECONDS; the DateTime (u32 seconds)
      // wire form would silently truncate a DateTime64 column's
      // sub-second ticks on SELECT (caught by the r17 compressed-
      // transport canary). DateTime64(6) is the lossless wire carrier
      // and every CH client reads it; the reference's fork cannot even
      // declare it.
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        BqlType.DateTime64(6, None)
      case _ => return BqlType.fromSpark(f.dataType, f.nullable)
    }
    if (f.nullable) BqlType.Nullable(base) else base
  }

  /** Decimal(20,0)-shape hint — sound ONLY for a declared table's schema
    * (INSERT header blocks, client-built insert blocks): BqlType caps
    * declarable decimals at precision 18, so the UInt64 widening is the
    * only way a TABLE column can be Decimal(20,0). Query results must use
    * [[WireTypes.uint64Positions]] lineage instead.
    */
  def tableShapeU64(schema: StructType): Int => Boolean = i =>
    schema.fields(i).dataType match {
      case d: org.apache.spark.sql.types.DecimalType =>
        d.precision == 20 && d.scale == 0
      case _ => false
    }

  private def baseOf(t: BqlType): BqlType = t match {
    case BqlType.Nullable(inner) => baseOf(inner)
    case BqlType.LowCardinality(inner) => baseOf(inner)
    case other => other
  }

  /** The Enum under an optional Nullable wrapper, if `t` is enum-shaped. */
  private def enumOf(t: BqlType): Option[BqlType.Enum] = t match {
    case e: BqlType.Enum => Some(e)
    case BqlType.Nullable(e: BqlType.Enum) => Some(e)
    case _ => None
  }

  /** Encode one server Data packet: PKID, temp-table name, then the block
    * body — raw (blocks.rs:193-210) or as one LZ4+CityHash compressed frame
    * (blocks.rs:246-310; the packet code and temp-table name always ride
    * uncompressed, only the body is framed).
    * `isU64` says which columns are true UInt64 widenings: pass
    * [[tableShapeU64]] when `schema` is a declared table's schema, or
    * [[WireTypes.uint64Positions]] lineage for query results.
    */
  def writeDataBlock(out: OutputStream, schema: StructType, rows: Seq[Row],
                     packetCode: Long = Server.Data,
                     isU64: Int => Boolean = null,
                     compress: Boolean = false,
                     declared: Int => Option[BqlType] = _ => None): Unit = {
    val u64 = if (isU64 == null) tableShapeU64(schema) else isU64
    writeVarint(out, packetCode)
    writeStr(out, "") // temporary table name
    if (compress) {
      val buf = new ByteArrayOutputStream()
      writeBlockBody(buf, schema, rows, u64, declared)
      Lz4Frames.writeFrame(out, buf.toByteArray)
    } else writeBlockBody(out, schema, rows, u64, declared)
    out.flush()
  }

  private def writeBlockBody(out: OutputStream, schema: StructType,
                             rows: Seq[Row], u64: Int => Boolean,
                             declared: Int => Option[BqlType] = _ => None): Unit = {
    // block info: (1, overflow=0), (2, bucket=-1), terminator 0
    writeVarint(out, 1); out.write(0)
    writeVarint(out, 2); writeIntLe(out, -1, 4)
    writeVarint(out, 0)
    writeVarint(out, schema.fields.length.toLong)
    writeVarint(out, rows.length.toLong)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      // a declared LowCardinality column keeps its real dict-block wire
      // framing (blocks.rs:480-531); everything else derives from the
      // Spark type as before
      declared(i) match {
        case Some(lc @ BqlType.LowCardinality(inner)) =>
          writeStr(out, f.name)
          writeStr(out, lc.chName)
          writeLowCardinalityColumn(out, inner,
            rows.map(r => if (r.isNullAt(i)) null else r.get(i)))
        case Some(den) if enumOf(den).isDefined =>
          // a declared Enum column ships as its base int with the full
          // Enum8/16('name' = code, ...) type-name metadata — CH's native
          // Enum wire form; storage here is the name string, so the
          // declared entries map it back to the code
          val en = enumOf(den).get
          val nullable = den.isInstanceOf[BqlType.Nullable]
          writeStr(out, f.name)
          writeStr(out, (if (nullable) BqlType.Nullable(en) else en).chName)
          if (nullable)
            rows.foreach(r => out.write(if (r.isNullAt(i)) 1 else 0))
          val codeOf = en.entries.toMap
          val width = if (en.width == 8) 1 else 2
          rows.foreach { r =>
            val code =
              if (r.isNullAt(i)) en.entries.head._2
              else codeOf.getOrElse(r.getString(i),
                throw new IllegalArgumentException(
                  s"value '${r.getString(i)}' is not an entry of ${en.chName}"))
            writeLongLe(out, code.toLong, width)
          }
        case _ =>
          val t = wireType(schema, i, u64)
          writeStr(out, f.name)
          writeStr(out, t.chName)
          baseOf(t) match {
            case BqlType.Arr(inner) =>
              // Array columns are never Nullable on the wire (CH forbids
              // it); a NULL array row degrades to [] by the fromSpark
              // contract.
              writeArrayColumn(out, inner, rows.map(r =>
                if (r.isNullAt(i)) Seq.empty[Any] else r.getSeq[Any](i)))
            case m: BqlType.ChMap =>
              // Map/Tuple are likewise never Nullable in CH; NULL rows
              // degrade to {} / default-tuple
              writeMapColumn(out, m, rows.map(r =>
                if (r.isNullAt(i)) null else r.get(i)))
            case tp: BqlType.ChTuple =>
              writeTupleColumn(out, tp, rows.map(r =>
                if (r.isNullAt(i)) null else r.get(i)))
            case base =>
              if (f.nullable) {
                // bulk null map: one stream write, not one per row
                val nm = new Array[Byte](rows.length)
                var r = 0
                rows.foreach { row =>
                  nm(r) = if (row.isNullAt(i)) 1 else 0; r += 1
                }
                out.write(nm)
              }
              writeScalarColumn(out, base, rows, i)
          }
      }
    }
  }

  // LowCardinality dict-block serialization flags (blocks.rs:119-120; the
  // same constants real ClickHouse uses: SerializationLowCardinality's
  // HasAdditionalKeysBit / NeedGlobalDictionaryBit / NeedUpdateDictionary)
  private val LcGlobalDictionary = 0x0100L
  private val LcAdditionalKeys = 0x0200L
  private val LcNeedUpdateDictionary = 0x0400L
  private val LcKeysVersion = 1L // SharedDictionariesWithAdditionalKeys

  /** Encode a LowCardinality column with CH's real dict-block framing:
    * u64 keys-serialization version (=1), then — only when rows exist,
    * matching real servers' zero-row header blocks — u64 serialization
    * flags (ADDITIONAL_KEY | NEED_UPDATE | key-width nibble), u64 dict
    * size + varstr dictionary, u64 row count + fixed-width index codes.
    * The reference decodes exactly this shape on client INSERT
    * (blocks.rs:480-531); its own zero-row INSERT header omits the
    * version prefix (types.rs:180-192 writes no prefix), a divergence
    * from real ClickHouse we resolve in real CH's favor.
    * For a Nullable inner type, dictionary index 0 is the null entry
    * (CH's convention), serialized as the inner type's default.
    */
  private def writeLowCardinalityColumn(out: OutputStream, inner: BqlType,
                                        values: Seq[Any]): Unit = {
    writeLongLe(out, LcKeysVersion, 8)
    if (values.isEmpty) return
    val (innerNullable, base) = inner match {
      case BqlType.Nullable(b) => (true, b)
      case b => (false, b)
    }
    val dict = new java.util.LinkedHashMap[Any, Integer]()
    if (innerNullable) dict.put(null, 0)
    val codes = values.map { v =>
      val key = if (v == null) {
        require(innerNullable,
          "NULL value in non-Nullable LowCardinality column")
        null
      } else v
      val existing = dict.get(key)
      if (existing != null) existing.intValue()
      else { val idx = dict.size(); dict.put(key, idx); idx }
    }
    val nDict = dict.size()
    val width = // smallest index type that addresses the dictionary
      if (nDict <= 0x100) 0 else if (nDict <= 0x10000) 1
      else if (nDict <= 0x100000000L) 2 else 3
    writeLongLe(out, LcAdditionalKeys | LcNeedUpdateDictionary | width.toLong, 8)
    writeLongLe(out, nDict.toLong, 8)
    val it = dict.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      writeScalar(out, base, k) // null entry writes the type default
    }
    writeLongLe(out, values.length.toLong, 8)
    val nBytes = 1 << width
    codes.foreach(c => writeLongLe(out, c.toLong, nBytes))
  }

  /** CH native Array(T) column layout: one UInt64 cumulative element count
    * per row (the offsets column), then the flattened elements serialized
    * as a plain column of the inner type — recursively, so Array(Array(T))
    * and Array(Nullable(T)) come for free.
    */
  private def writeArrayColumn(out: OutputStream, inner: BqlType,
                               arrays: Seq[Seq[Any]]): Unit = {
    writeCumOffsets(out, arrays.iterator.map(_.length), arrays.length)
    writeElements(out, inner, arrays.flatten)
  }

  /** Bulk UInt64 cumulative-offset run (one stream write) — identical
    * bytes to the per-row writeLongLe loop.
    */
  private def writeCumOffsets(out: OutputStream, lens: Iterator[Int],
                              n: Int): Unit = {
    val arr = new Array[Byte](n * 8)
    var cum = 0L
    var off = 0
    lens.foreach { l =>
      cum += l
      var b = cum
      var j = 0
      while (j < 8) { arr(off + j) = (b & 0xff).toByte; b >>>= 8; j += 1 }
      off += 8
    }
    out.write(arr)
  }

  private def writeElements(out: OutputStream, t: BqlType, vs: Seq[Any]): Unit =
    t match {
      case BqlType.Nullable(inner) =>
        vs.foreach(v => out.write(if (v == null) 1 else 0))
        writeElements(out, inner, vs)
      case BqlType.Arr(inner) =>
        writeArrayColumn(out, inner, vs.map {
          case null => Seq.empty[Any]
          case s: scala.collection.Seq[_] => s.toSeq
          case other => throw new IllegalArgumentException(
            s"nested array element is not a Seq: $other")
        })
      case BqlType.LowCardinality(inner) => writeElements(out, inner, vs)
      case m: BqlType.ChMap => writeMapColumn(out, m, vs)
      case tp: BqlType.ChTuple => writeTupleColumn(out, tp, vs)
      case base =>
        val w = fixedWidth(base)
        if (w < 0) vs.foreach(v => writeScalar(out, base, v))
        else {
          // bulk fixed-width element encode — same bytes as the
          // per-value writeScalar loop, one stream write per run
          val arr = new Array[Byte](vs.length * w)
          var off = 0
          vs.foreach { v =>
            var bits = scalarBits(base, v)
            var j = 0
            while (j < w) {
              arr(off + j) = (bits & 0xff).toByte; bits >>>= 8; j += 1
            }
            off += w
          }
          out.write(arr)
        }
    }

  /** CH native Map(K, V) layout — the Nested(keys K, values V) framing:
    * one UInt64 cumulative entry count per row (offsets), then the
    * flattened keys as a plain column of K, then the flattened values as
    * a plain column of V (SerializationMap serializes the nested
    * Array(Tuple(K, V)) this way). A NULL map row degrades to {} (CH has
    * no Nullable(Map)).
    */
  private def writeMapColumn(out: OutputStream, m: BqlType.ChMap,
                             maps: Seq[Any]): Unit = {
    val entries: Seq[Seq[(Any, Any)]] = maps.map {
      case null => Seq.empty[(Any, Any)]
      case mp: scala.collection.Map[_, _] =>
        mp.toSeq.asInstanceOf[Seq[(Any, Any)]]
      case other => throw new IllegalArgumentException(
        s"Map column value is not a Map: $other")
    }
    writeCumOffsets(out, entries.iterator.map(_.length), entries.length)
    val flat = entries.flatten
    writeElements(out, m.k, flat.map(_._1))
    writeElements(out, m.v, flat.map(_._2))
  }

  /** CH native Tuple layout: each element serialized as its own
    * full-length column, in declaration order (a Nullable element carries
    * its null map inside its own sub-column). A NULL tuple row degrades
    * to the per-element defaults (CH has no Nullable(Tuple)).
    */
  private def writeTupleColumn(out: OutputStream, tp: BqlType.ChTuple,
                               vs: Seq[Any]): Unit =
    tp.fields.zipWithIndex.foreach { case ((_, ft), j) =>
      writeElements(out, ft, vs.map {
        case null => null
        case r: Row => r.get(j)
        case other => throw new IllegalArgumentException(
          s"Tuple column value is not a Row: $other")
      })
    }

  /** One scalar in CH native column encoding, from its Spark EXTERNAL form
    * (Row getters and array elements both produce these). Null writes the
    * type's zero default — the null map has already said it's null.
    */
  /** Wire width in bytes of a fixed-width scalar type, or -1 when the
    * type is variable-width (String/UUID/…). Gates the BULK column
    * encode/decode below: per-value `OutputStream.write`/`readBytes`
    * calls were the measured wire-ingest hot spot (one virtual call and
    * one small allocation per VALUE — ~11M of each for a 600k-row
    * 3-column block; PERF.md r19), so fixed-width columns move through
    * one contiguous byte array per column instead. The bytes produced
    * and consumed are identical to the per-value path.
    */
  private def fixedWidth(t: BqlType): Int = {
    import BqlType._
    t match {
      case Int8 | UInt8 => 1
      case Int16 | UInt16 | Date => 2
      case Int32 | UInt32 | Float32 | Date32 | DateTime(_) => 4
      case Int64 | UInt64 | Float64 | DateTime64(_, _) => 8
      case Decimal(p, _) => if (p <= 9) 4 else 8
      case _ => -1
    }
  }

  /** The Long whose low [[fixedWidth]] bytes are the value's wire
    * encoding — the exact argument [[writeScalar]] hands writeLongLe,
    * factored out so the bulk path shares the conversion logic.
    */
  private def scalarBits(t: BqlType, v: Any): Long = {
    import BqlType._
    val isNull = v == null
    t match {
      case Int8 => if (isNull) 0L else v.asInstanceOf[Byte].toLong
      case Int16 => if (isNull) 0L else v.asInstanceOf[Short].toLong
      case Int32 => if (isNull) 0L else v.asInstanceOf[Int].toLong
      case Int64 => if (isNull) 0L else v.asInstanceOf[Long]
      case UInt8 => if (isNull) 0L else v.asInstanceOf[Short].toLong
      case UInt16 => if (isNull) 0L else v.asInstanceOf[Int].toLong
      case UInt32 => if (isNull) 0L else v.asInstanceOf[Long]
      case UInt64 => v match {
        case null => 0L
        case d: java.math.BigDecimal => d.toBigInteger.longValue()
        case d: scala.math.BigDecimal => d.underlying().toBigInteger.longValue()
      }
      case Float32 => java.lang.Float.floatToIntBits(
        if (isNull) 0f else v.asInstanceOf[Float]).toLong
      case Float64 => java.lang.Double.doubleToLongBits(
        if (isNull) 0d else v.asInstanceOf[Double])
      case Decimal(_, _) => v match {
        case null => 0L
        case d: java.math.BigDecimal => d.unscaledValue().longValueExact()
        case d: scala.math.BigDecimal =>
          d.underlying().unscaledValue().longValueExact()
      }
      case Date | Date32 => v match {
        case null => 0L
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case d: java.time.LocalDate => d.toEpochDay
      }
      case DateTime(_) => v match {
        case null => 0L
        case ts: java.sql.Timestamp => ts.getTime / 1000L
        case ts: java.time.Instant => ts.getEpochSecond
        case ts: java.time.LocalDateTime =>
          ts.toEpochSecond(java.time.ZoneOffset.UTC)
      }
      case DateTime64(p, _) =>
        val micros = v match {
          case null => 0L
          case ts: java.sql.Timestamp =>
            ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
          case ts: java.time.Instant =>
            ts.getEpochSecond * 1000000L + ts.getNano / 1000L
          case ts: java.time.LocalDateTime =>
            val inst = ts.toInstant(java.time.ZoneOffset.UTC)
            inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        }
        if (p <= 6) micros / math.pow(10, 6 - p).toLong
        else micros * math.pow(10, p - 6).toLong
      case other => throw new IllegalStateException(
        s"scalarBits on variable-width type $other")
    }
  }

  /** Bulk column encode: fixed-width scalars land in one contiguous
    * array (one stream write per COLUMN); variable-width types keep the
    * per-value [[writeScalar]] loop.
    */
  private def writeScalarColumn(out: OutputStream, base: BqlType,
                                rows: Seq[Row], i: Int): Unit = {
    val w = fixedWidth(base)
    if (w < 0) {
      rows.foreach(r =>
        writeScalar(out, base, if (r.isNullAt(i)) null else r.get(i)))
      return
    }
    val arr = new Array[Byte](rows.length * w)
    var off = 0
    rows.foreach { r =>
      var bits = scalarBits(base, if (r.isNullAt(i)) null else r.get(i))
      var j = 0
      while (j < w) { arr(off + j) = (bits & 0xff).toByte; bits >>>= 8; j += 1 }
      off += w
    }
    out.write(arr)
  }

  private[graft] def writeScalar(out: OutputStream, t: BqlType, v: Any): Unit = {
    import BqlType._
    val isNull = v == null
    t match {
      case Int8 => out.write(if (isNull) 0 else v.asInstanceOf[Byte].toInt & 0xff)
      case Int16 => writeIntLe(out, if (isNull) 0 else v.asInstanceOf[Short].toInt, 2)
      case Int32 => writeIntLe(out, if (isNull) 0 else v.asInstanceOf[Int], 4)
      case Int64 => writeLongLe(out, if (isNull) 0L else v.asInstanceOf[Long], 8)
      case UInt8 => out.write(if (isNull) 0 else v.asInstanceOf[Short].toInt & 0xff)
      case UInt16 => writeIntLe(out, if (isNull) 0 else v.asInstanceOf[Int], 2)
      case UInt32 => writeLongLe(out, if (isNull) 0L else v.asInstanceOf[Long], 4)
      case UInt64 =>
        val big = v match {
          case null => BigInteger.ZERO
          case d: java.math.BigDecimal => d.toBigInteger
          case d: scala.math.BigDecimal => d.underlying().toBigInteger
        }
        writeLongLe(out, big.longValue(), 8) // low 64 bits = full unsigned range
      case Float32 =>
        writeIntLe(out, java.lang.Float.floatToIntBits(
          if (isNull) 0f else v.asInstanceOf[Float]), 4)
      case Float64 =>
        writeLongLe(out, java.lang.Double.doubleToLongBits(
          if (isNull) 0d else v.asInstanceOf[Double]), 8)
      case Decimal(p, _) =>
        val unscaled = v match {
          case null => 0L
          case d: java.math.BigDecimal => d.unscaledValue().longValueExact()
          case d: scala.math.BigDecimal => d.underlying().unscaledValue().longValueExact()
        }
        writeLongLe(out, unscaled, if (p <= 9) 4 else 8)
      case Date =>
        val days = v match {
          case null => 0L
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
        }
        writeLongLe(out, days, 2)
      case Date32 =>
        // i32 days since epoch (signed — pre-1970 dates are in range)
        val days = v match {
          case null => 0L
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
        }
        writeLongLe(out, days, 4)
      case DateTime(_) =>
        val secs = v match {
          case null => 0L
          case ts: java.sql.Timestamp => ts.getTime / 1000L
          case ts: java.time.Instant => ts.getEpochSecond
          // TIMESTAMP_NTZ's external form; session is pinned UTC
          case ts: java.time.LocalDateTime =>
            ts.toEpochSecond(java.time.ZoneOffset.UTC)
        }
        writeLongLe(out, secs, 4)
      case DateTime64(p, _) =>
        // i64 ticks at 10^-p seconds
        val micros = v match {
          case null => 0L
          case ts: java.sql.Timestamp =>
            ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
          case ts: java.time.Instant =>
            ts.getEpochSecond * 1000000L + ts.getNano / 1000L
          case ts: java.time.LocalDateTime =>
            val i = ts.toInstant(java.time.ZoneOffset.UTC)
            i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        val ticks =
          if (p <= 6) micros / math.pow(10, 6 - p).toLong
          else micros * math.pow(10, p - 6).toLong
        writeLongLe(out, ticks, 8)
      case _ => // String / UUID / FixedString-as-binary: varbytes
        if (isNull) writeStr(out, "")
        else v match {
          case bytes: Array[Byte] => // binary columns ride raw, not toString'd
            writeVarint(out, bytes.length.toLong); out.write(bytes)
          case other => writeStr(out, String.valueOf(other))
        }
    }
  }

  def writeEndOfStream(out: OutputStream): Unit = {
    writeVarint(out, Server.EndOfStream)
    out.flush()
  }

  /** Exception packet (codecs.rs:91-98): code, name, message, stack trace,
    * has_nested.
    */
  def writeException(out: OutputStream, code: Int, name: String, msg: String): Unit = {
    writeVarint(out, Server.Exception)
    writeIntLe(out, code, 4)
    writeStr(out, name)
    writeStr(out, msg)
    writeStr(out, "")
    writeVarint(out, 0)
    out.flush()
  }

  // ---- block decode (used by clients / tests) -------------------------
  final case class WireColumn(name: String, chType: String, values: Vector[Any])
  final case class WireBlock(columns: Vector[WireColumn], nRows: Int)

  def readDataBlock(in: InputStream, compressed: Boolean = false): WireBlock = {
    val _ = readStr(in) // temp table name (always uncompressed)
    val body =
      if (compressed) new java.io.ByteArrayInputStream(Lz4Frames.readFrame(in))
      else in
    readBlockBody(body)
  }

  private def readBlockBody(in: InputStream): WireBlock = {
    // block info field pairs until terminator 0
    var field = readVarint(in)
    while (field != 0) {
      field match {
        case 1 => in.read(): Unit
        case 2 => readBytes(in, 4): Unit
        case other => throw new IllegalStateException(s"unknown block-info field $other")
      }
      field = readVarint(in)
    }
    val nCols = readVarint(in).toInt
    val nRows = readVarint(in).toInt
    val cols = Vector.tabulate(nCols) { _ =>
      val name = readStr(in)
      val typeName = readStr(in)
      val t = BqlType.parse(typeName).fold(e => sys.error(e), identity)
      val values = t match {
        case BqlType.LowCardinality(inner) =>
          // real dict-block framing — never a top-level null map
          readLowCardinalityColumn(in, inner, nRows)
        case _ =>
          val (nullable, base) = t match {
            case BqlType.Nullable(inner) => (true, inner)
            case other => (false, other)
          }
          val nulls =
            if (nullable) readBytes(in, nRows).map(_ != 0)
            else Array.fill(nRows)(false)
          base match {
            case arr: BqlType.Arr => readArrayColumn(in, arr.inner, nRows)
            case m: BqlType.ChMap => readMapColumn(in, m, nRows)
            case tp: BqlType.ChTuple => readTupleColumn(in, tp, nRows)
            case en: BqlType.Enum =>
              val byCode = en.entries.map(_.swap).toMap
              val width = if (en.width == 8) 1 else 2
              Vector.tabulate(nRows) { r =>
                val code = readLongLe(in, width).toInt
                // sign-extend the narrow reads (Enum8 codes are i8)
                val signed = if (en.width == 8) code.toByte.toInt
                             else code.toShort.toInt
                // null slots of Nullable(Enum) carry the BASE column
                // default (0 bytes) on a real CH server — consume the
                // bytes but never validate them against the declared
                // entries (ADVICE r18: 0 need not be an entry)
                if (nulls(r)) null
                else byCode.getOrElse(signed, throw new java.io.IOException(
                  s"enum code $signed is not an entry of ${en.chName}"))
              }
            case _ => readScalarColumn(in, base, nRows, nulls)
          }
      }
      WireColumn(name, typeName, values)
    }
    WireBlock(cols, nRows)
  }

  /** Convert a decoded wire block to Spark rows conforming to `schema`
    * (positional, full arity — the header block the server sent fixes the
    * column order). Wire-native values (LocalDate, Instant, BigInteger)
    * become their Spark external types.
    */
  def blockToRows(block: WireBlock,
                  schema: org.apache.spark.sql.types.StructType): Seq[Row] = {
    import org.apache.spark.sql.types._
    require(block.columns.length == schema.fields.length,
      s"wire block arity ${block.columns.length} != table arity ${schema.fields.length}")
    // one type dispatch per COLUMN, not per value (the per-value
    // `(v, dt) match` allocated a Tuple2 for every cell — a measured
    // decode hot spot at 600k-row blocks, PERF.md r19); scalar columns
    // whose wire value already IS the external type get the identity
    def converterFor(dt: DataType): Any => Any = dt match {
      case DateType => {
        case v: java.time.LocalDate => java.sql.Date.valueOf(v)
        case v => v
      }
      case TimestampType => {
        case v: java.time.Instant => java.sql.Timestamp.from(v)
        case v => v
      }
      case _: DecimalType => {
        case v: scala.math.BigDecimal => v.underlying()
        case v: java.math.BigInteger => new java.math.BigDecimal(v)
        case v: String => new java.math.BigDecimal(v) // wide-decimal wire form
        case v: java.lang.Number => new java.math.BigDecimal(v.toString)
        case v => v
      }
      // numeric widenings: a client block may declare a NARROWER type
      // than the table column (INSERT ... SELECT 3 ships Int32 into an
      // Int64 column) — real ClickHouse casts client blocks to the table
      // types on insert, so the decode side widens here too
      case LongType => {
        case v: java.lang.Long => v
        case v: java.lang.Number => java.lang.Long.valueOf(v.longValue())
        case v => v
      }
      case IntegerType => {
        case v: java.lang.Integer => v
        case v: java.lang.Number => java.lang.Integer.valueOf(v.intValue())
        case v => v
      }
      case ShortType => {
        case v: java.lang.Short => v
        case v: java.lang.Number => java.lang.Short.valueOf(v.shortValue())
        case v => v
      }
      case DoubleType => {
        case v: java.lang.Double => v
        case v: java.lang.Number => java.lang.Double.valueOf(v.doubleValue())
        case v => v
      }
      case FloatType => {
        case v: java.lang.Float => v
        case v: java.lang.Number => java.lang.Float.valueOf(v.floatValue())
        case v => v
      }
      case BinaryType => {
        case v: String => v.getBytes("UTF-8") // FixedString rides as varbytes
        case v => v
      }
      case ArrayType(et, _) =>
        val ec = converterFor(et)
        v => v.asInstanceOf[scala.collection.Seq[Any]].toSeq
          .map(x => if (x == null) null else ec(x))
      case MapType(kt, vt, _) =>
        val kc = converterFor(kt)
        val vc = converterFor(vt)
        v => v.asInstanceOf[scala.collection.Map[Any, Any]].map {
          case (k, vv) =>
            (if (k == null) null else kc(k)) ->
              (if (vv == null) null else vc(vv))
        }.toMap
      case st: StructType =>
        val fcs = st.fields.map(f => converterFor(f.dataType))
        v => {
          val row = v.asInstanceOf[Row]
          val arr = new Array[Any](fcs.length)
          var j = 0
          while (j < fcs.length) {
            val x = row.get(j)
            arr(j) = if (x == null) null else fcs(j)(x)
            j += 1
          }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
        }
      case _ => identity
    }
    val convs = schema.fields.map(f => converterFor(f.dataType))
    val nCols = convs.length
    (0 until block.nRows).map { r =>
      val arr = new Array[Any](nCols)
      var c = 0
      while (c < nCols) {
        val v = block.columns(c).values(r)
        arr(c) = if (v == null) null else convs(c)(v)
        c += 1
      }
      Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
    }
  }

  /** Inverse of [[writeArrayColumn]]: cumulative UInt64 offsets, then the
    * flattened inner column, sliced back per row.
    */
  /** Bulk UInt64 cumulative-offset read (one contiguous readBytes) —
    * value-identical to Vector.fill(n)(readLongLe(in, 8)).
    */
  private def readCumOffsets(in: InputStream, n: Int): Vector[Long] = {
    val bytes = readBytes(in, n * 8)
    Vector.tabulate(n) { i =>
      val off = i * 8
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (bytes(off + j) & 0xffL); j -= 1 }
      v
    }
  }

  private def readArrayColumn(in: InputStream, inner: BqlType,
                              nRows: Int): Vector[Any] = {
    // keep the UInt64 cumulative offsets as Long and validate before
    // narrowing: a block whose flattened element count exceeds
    // Int.MaxValue must fail loudly, not wrap negative and mis-slice
    // every row
    val offsets = readCumOffsets(in, nRows)
    var prevL = 0L
    offsets.foreach { o =>
      if (o < prevL || o > Int.MaxValue.toLong)
        throw new java.io.IOException(
          s"Array column offsets invalid: $o (prev $prevL) — " +
            "non-monotonic or exceeds per-block element limit")
      prevL = o
    }
    val total = if (nRows == 0) 0 else offsets.last.toInt
    val flat = readElements(in, inner, total)
    var prev = 0
    offsets.map { oL => val o = oL.toInt; val s = flat.slice(prev, o); prev = o; s }
  }

  /** Inverse of [[writeLowCardinalityColumn]], with the reference's own
    * validation (blocks.rs:483-499): keys version must be 1, GLOBAL
    * dictionaries are rejected, ADDITIONAL_KEY must be set, and the key
    * width nibble must name u8/u16/u32/u64. Codes are bounds-checked
    * against the dictionary before materializing.
    */
  private def readLowCardinalityColumn(in: InputStream, inner: BqlType,
                                       nRows: Int): Vector[Any] = {
    val ver = readLongLe(in, 8)
    if (ver != LcKeysVersion)
      throw new java.io.IOException(
        s"unsupported LowCardinality keys-serialization version $ver")
    if (nRows == 0) return Vector.empty
    val flags = readLongLe(in, 8)
    if ((flags & LcGlobalDictionary) != 0 || (flags & LcAdditionalKeys) == 0)
      throw new java.io.IOException(
        f"unsupported LowCardinality serialization flags 0x$flags%x " +
          "(global dictionaries are not supported; additional keys required)")
    val width = (flags & 0x0FL).toInt
    if (width < 0 || width > 3)
      throw new java.io.IOException(
        s"unsupported LowCardinality index key width $width")
    val (innerNullable, base) = inner match {
      case BqlType.Nullable(b) => (true, b)
      case b => (false, b)
    }
    val nDict = readLongLe(in, 8)
    // An ADDITIONAL_KEYS (per-block) dictionary larger than the block's
    // row count (+1 for a Nullable null slot) is never legitimate —
    // bound BEFORE allocating, so a hostile/corrupt peer claiming a
    // multi-billion-entry dict fails cheaply instead of triggering a
    // huge Vector.fill allocation (ADVICE r11).
    if (nDict < 0 || nDict > nRows.toLong + 1)
      throw new java.io.IOException(
        s"LowCardinality dict size $nDict invalid for $nRows-row block")
    val dict = Vector.fill(nDict.toInt)(readValue(in, base))
    val nKeys = readLongLe(in, 8)
    if (nKeys != nRows.toLong)
      throw new java.io.IOException(
        s"LowCardinality row count $nKeys != block rows $nRows")
    val nBytes = 1 << width
    Vector.fill(nRows) {
      val code = readLongLe(in, nBytes)
      if (code < 0 || code >= nDict)
        throw new java.io.IOException(
          s"LowCardinality index $code out of dictionary range [0, $nDict)")
      if (innerNullable && code == 0L) null else dict(code.toInt)
    }
  }

  private def readElements(in: InputStream, t: BqlType, n: Int): Vector[Any] =
    t match {
      case BqlType.Nullable(inner) =>
        val nulls = readBytes(in, n).map(_ != 0)
        val vs = readElements(in, inner, n)
        Vector.tabulate(n)(i => if (nulls(i)) null else vs(i))
      case arr: BqlType.Arr => readArrayColumn(in, arr.inner, n)
      case BqlType.LowCardinality(inner) => readElements(in, inner, n)
      case m: BqlType.ChMap => readMapColumn(in, m, n)
      case tp: BqlType.ChTuple => readTupleColumn(in, tp, n)
      case base =>
        // flattened array/map/tuple element runs get the same bulk
        // fixed-width decode as top-level columns (embedding vectors are
        // Array(Float32/64) — the dominant federation payload)
        if (fixedWidth(base) >= 0) readScalars(in, base, n)
        else Vector.fill(n)(readValue(in, base))
    }

  /** Inverse of [[writeMapColumn]]: cumulative offsets, flattened keys
    * column, flattened values column → one Scala Map per row.
    */
  private def readMapColumn(in: InputStream, m: BqlType.ChMap,
                            nRows: Int): Vector[Any] = {
    val offsets = readCumOffsets(in, nRows)
    var prevL = 0L
    offsets.foreach { o =>
      if (o < prevL || o > Int.MaxValue.toLong)
        throw new java.io.IOException(
          s"Map column offsets invalid: $o (prev $prevL)")
      prevL = o
    }
    val total = if (nRows == 0) 0 else offsets.last.toInt
    val keys = readElements(in, m.k, total)
    val vals = readElements(in, m.v, total)
    var prev = 0
    offsets.map { oL =>
      val o = oL.toInt
      val mp = (prev until o).map(j => keys(j) -> vals(j)).toMap
      prev = o
      mp
    }
  }

  /** Inverse of [[writeTupleColumn]]: element columns in order → one Row
    * per row.
    */
  private def readTupleColumn(in: InputStream, tp: BqlType.ChTuple,
                              nRows: Int): Vector[Any] = {
    val colsByField = tp.fields.map { case (_, ft) =>
      readElements(in, ft, nRows) }
    Vector.tabulate(nRows)(r => Row.fromSeq(colsByField.map(_(r))))
  }

  /** Bulk column decode: fixed-width scalars come off the stream as one
    * contiguous read (the per-value `readBytes` allocation was the
    * decode hot spot — see [[fixedWidth]]); variable-width types keep
    * the per-value [[readValue]] loop. Value-for-value identical to the
    * per-value path.
    */
  private def readScalarColumn(in: InputStream, base: BqlType, nRows: Int,
                               nulls: Array[Boolean]): Vector[Any] = {
    if (fixedWidth(base) < 0)
      return Vector.tabulate(nRows) { r =>
        val v = readValue(in, base)
        if (nulls(r)) null else v
      }
    val vs = readScalars(in, base, nRows)
    if (nulls.exists(identity))
      Vector.tabulate(nRows)(r => if (nulls(r)) null else vs(r))
    else vs
  }

  /** Bulk decode of `n` fixed-width scalars: one contiguous read, then
    * per-row assembly from the array — value-for-value identical to
    * `Vector.fill(n)(readValue(in, base))`. Callers must have checked
    * [[fixedWidth]] >= 0.
    */
  private def readScalars(in: InputStream, base: BqlType, nRows: Int): Vector[Any] = {
    import BqlType._
    val w = fixedWidth(base)
    val bytes = readBytes(in, nRows * w)
    // unsigned little-endian assembly — readLongLe's contract
    def bits(r: Int): Long = {
      val off = r * w
      var v = 0L
      var j = w - 1
      while (j >= 0) { v = (v << 8) | (bytes(off + j) & 0xffL); j -= 1 }
      v
    }
    def decode(r: Int): Any = base match {
      case Int8 => bits(r).toByte
      case Int16 => bits(r).toShort
      case Int32 => bits(r).toInt
      case Int64 => bits(r)
      case UInt8 => bits(r).toShort
      case UInt16 => bits(r).toInt
      case UInt32 => bits(r)
      case UInt64 => new BigInteger(java.lang.Long.toUnsignedString(bits(r)))
      case Float32 => java.lang.Float.intBitsToFloat(bits(r).toInt)
      case Float64 => java.lang.Double.longBitsToDouble(bits(r))
      case Decimal(p, s) =>
        val unscaled = if (p <= 9) bits(r).toInt.toLong else bits(r)
        BigDecimal(BigInt(unscaled), s)
      case Date => java.time.LocalDate.ofEpochDay(bits(r))
      case Date32 => java.time.LocalDate.ofEpochDay(bits(r).toInt.toLong)
      case DateTime(_) => java.time.Instant.ofEpochSecond(bits(r))
      case DateTime64(p, _) =>
        val ticks = bits(r)
        val micros =
          if (p <= 6) ticks * math.pow(10, 6 - p).toLong
          else ticks / math.pow(10, p - 6).toLong
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L)
      case other => throw new IllegalStateException(
        s"readScalars on variable-width type $other")
    }
    Vector.tabulate(nRows)(decode)
  }

  private[graft] def readValue(in: InputStream, t: BqlType): Any = {
    import BqlType._
    t match {
      case Int8 => readLongLe(in, 1).toByte
      case Int16 => readLongLe(in, 2).toShort
      case Int32 => readLongLe(in, 4).toInt
      case Int64 => readLongLe(in, 8)
      case UInt8 => readLongLe(in, 1).toShort
      case UInt16 => readLongLe(in, 2).toInt
      case UInt32 => readLongLe(in, 4)
      case UInt64 =>
        val lo = readLongLe(in, 8)
        new BigInteger(java.lang.Long.toUnsignedString(lo))
      case Float32 => java.lang.Float.intBitsToFloat(readLongLe(in, 4).toInt)
      case Float64 => java.lang.Double.longBitsToDouble(readLongLe(in, 8))
      case Decimal(p, s) =>
        // 4-byte decimals need sign extension (readLongLe is unsigned)
        val unscaled =
          if (p <= 9) readLongLe(in, 4).toInt.toLong else readLongLe(in, 8)
        BigDecimal(BigInt(unscaled), s)
      case Date => java.time.LocalDate.ofEpochDay(readLongLe(in, 2))
      case Date32 =>
        // sign-extend the i32 (readLongLe is unsigned)
        java.time.LocalDate.ofEpochDay(readLongLe(in, 4).toInt.toLong)
      case DateTime(_) => java.time.Instant.ofEpochSecond(readLongLe(in, 4))
      case DateTime64(p, _) =>
        val ticks = readLongLe(in, 8)
        val micros =
          if (p <= 6) ticks * math.pow(10, 6 - p).toLong
          else ticks / math.pow(10, p - 6).toLong
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L)
      case _ => readStr(in)
    }
  }
}
