package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.zip.{Deflater, DeflaterOutputStream, Inflater, InflaterInputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Apache Avro Object Container File codec, from scratch against the public
  * Avro 1.11 specification (no spark-avro jar exists in /opt/spark/jars —
  * the one §2.2 row the round-2/3 ledgers carried as env-blocked. The
  * reference bundles but never wires an avro reader:
  * crates/datafusion/src/physical_plan/file_format/avro.rs).
  *
  * Container layout: magic `Obj\1` · file-metadata map (`avro.schema` JSON,
  * `avro.codec` null|deflate) · 16-byte sync marker · data blocks
  * (row-count, byte-length, records, sync). Scalars use zigzag-varint
  * longs, IEEE-LE floats, length-prefixed UTF-8; nullable fields are
  * `["null", T]` unions; deflate is raw RFC-1951 (Deflater nowrap).
  *
  * Spark type mapping round-trips every driver table: date ↔ `int/date`
  * (both sides count epoch days), timestamp ↔ `long/timestamp-micros`
  * (both count micros), decimal ↔ `bytes/decimal` (two's-complement
  * big-endian unscaled), arrays ↔ avro arrays.
  */
object AvroFiles {

  // ---- schema model ----------------------------------------------------

  sealed trait AvType
  case object ANull extends AvType
  case object ABool extends AvType
  case object AInt extends AvType
  case object ALong extends AvType
  case object AFloat extends AvType
  case object ADouble extends AvType
  case object AString extends AvType
  case object ABytes extends AvType
  case object ADate extends AvType // int, logicalType: date
  case object ATimestampMicros extends AvType // long, logicalType: timestamp-micros
  final case class ADecimal(precision: Int, scale: Int) extends AvType // bytes, logicalType: decimal
  final case class AArray(items: AvType, itemsNullable: Boolean) extends AvType
  final case class ARecord(name: String, fields: Seq[AvField]) extends AvType
  final case class AvField(name: String, tpe: AvType, nullable: Boolean)

  def toAvro(schema: StructType, name: String = "topLevelRecord"): ARecord =
    ARecord(name, schema.fields.toSeq.map { f =>
      AvField(f.name, toAvroType(f.dataType), f.nullable)
    })

  private def toAvroType(dt: DataType): AvType = dt match {
    case BooleanType => ABool
    case ByteType | ShortType | IntegerType => AInt
    case LongType => ALong
    case FloatType => AFloat
    case DoubleType => ADouble
    case StringType => AString
    case BinaryType => ABytes
    case DateType => ADate
    case TimestampType => ATimestampMicros
    case d: DecimalType => ADecimal(d.precision, d.scale)
    case ArrayType(et, containsNull) => AArray(toAvroType(et), containsNull)
    case other =>
      throw new UnsupportedOperationException(s"avro: unsupported Spark type $other")
  }

  def toSpark(r: ARecord): StructType =
    StructType(r.fields.map(f => StructField(f.name, toSparkType(f.tpe), f.nullable)))

  private def toSparkType(t: AvType): DataType = t match {
    case ABool => BooleanType
    case AInt => IntegerType
    case ALong => LongType
    case AFloat => FloatType
    case ADouble => DoubleType
    case AString => StringType
    case ABytes => BinaryType
    case ADate => DateType
    case ATimestampMicros => TimestampType
    case ADecimal(p, s) => DecimalType(p, s)
    case AArray(et, n) => ArrayType(toSparkType(et), n)
    case ARecord(_, fs) =>
      StructType(fs.map(f => StructField(f.name, toSparkType(f.tpe), f.nullable)))
    case ANull => NullType
  }

  // ---- schema JSON (writer side renders, reader side parses) -----------

  def schemaJson(r: ARecord): String = {
    val fields = r.fields.map { f =>
      val t = typeJson(f.tpe)
      val tj = if (f.nullable) s"""["null",$t]""" else t
      s"""{"name":${q(f.name)},"type":$tj}"""
    }.mkString(",")
    s"""{"type":"record","name":${q(r.name)},"fields":[$fields]}"""
  }

  private def typeJson(t: AvType): String = t match {
    case ANull => "\"null\""
    case ABool => "\"boolean\""
    case AInt => "\"int\""
    case ALong => "\"long\""
    case AFloat => "\"float\""
    case ADouble => "\"double\""
    case AString => "\"string\""
    case ABytes => "\"bytes\""
    case ADate => """{"type":"int","logicalType":"date"}"""
    case ATimestampMicros => """{"type":"long","logicalType":"timestamp-micros"}"""
    case ADecimal(p, s) =>
      s"""{"type":"bytes","logicalType":"decimal","precision":$p,"scale":$s}"""
    case AArray(et, n) =>
      val items = if (n) s"""["null",${typeJson(et)}]""" else typeJson(et)
      s"""{"type":"array","items":$items}"""
    case ARecord(name, fs) =>
      val fields = fs.map { f =>
        val tj = if (f.nullable) s"""["null",${typeJson(f.tpe)}]""" else typeJson(f.tpe)
        s"""{"name":${q(f.name)},"type":$tj}"""
      }.mkString(",")
      s"""{"type":"record","name":${q(name)},"fields":[$fields]}"""
  }

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def parseSchema(json: String): ARecord = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def tpe(jv: JValue): (AvType, Boolean) = jv match {
      case JString(s) => (prim(s), false)
      case JArray(branches) =>
        // only ["null", T] unions are produced/accepted (Spark nullability)
        val non = branches.filterNot(_ == JString("null"))
        if (non.size != 1)
          throw new UnsupportedOperationException(s"avro: general union $branches")
        (tpe(non.head)._1, branches.contains(JString("null")))
      case o: JObject =>
        val t = (o \ "type") match {
          case JString(s) => s
          case other => throw new UnsupportedOperationException(s"avro: type $other")
        }
        val logical = (o \ "logicalType") match {
          case JString(s) => Some(s); case _ => None
        }
        (t, logical) match {
          case ("int", Some("date")) => (ADate, false)
          case ("long", Some("timestamp-micros")) => (ATimestampMicros, false)
          case ("bytes", Some("decimal")) =>
            val JInt(p) = (o \ "precision"): @unchecked
            val s = (o \ "scale") match { case JInt(v) => v.toInt; case _ => 0 }
            (ADecimal(p.toInt, s), false)
          case ("array", _) =>
            val (it, n) = tpe(o \ "items")
            (AArray(it, n), false)
          case ("record", _) =>
            val JString(name) = (o \ "name"): @unchecked
            val JArray(fs) = (o \ "fields"): @unchecked
            val fields = fs.map { f =>
              val JString(fn) = (f \ "name"): @unchecked
              val (ft, nullable) = tpe(f \ "type")
              AvField(fn, ft, nullable)
            }
            (ARecord(name, fields), false)
          case (p, _) => (prim(p), false)
        }
      case other => throw new UnsupportedOperationException(s"avro: schema $other")
    }
    def prim(s: String): AvType = s match {
      case "null" => ANull
      case "boolean" => ABool
      case "int" => AInt
      case "long" => ALong
      case "float" => AFloat
      case "double" => ADouble
      case "string" => AString
      case "bytes" => ABytes
      case other => throw new UnsupportedOperationException(s"avro: primitive $other")
    }
    tpe(JsonMethods.parse(json))._1 match {
      case r: ARecord => r
      case other =>
        throw new UnsupportedOperationException(s"avro: top-level $other is not a record")
    }
  }

  // ---- binary primitives ----------------------------------------------

  final class Encoder(out: OutputStream) {
    def writeLong(v: Long): Unit = {
      var n = (v << 1) ^ (v >> 63) // zigzag
      while ((n & ~0x7FL) != 0) {
        out.write(((n & 0x7F) | 0x80).toInt); n >>>= 7
      }
      out.write(n.toInt)
    }
    def writeInt(v: Int): Unit = writeLong(v.toLong)
    def writeBool(v: Boolean): Unit = out.write(if (v) 1 else 0)
    def writeFloat(v: Float): Unit = {
      val bits = java.lang.Float.floatToIntBits(v)
      out.write(bits & 0xFF); out.write((bits >> 8) & 0xFF)
      out.write((bits >> 16) & 0xFF); out.write((bits >> 24) & 0xFF)
    }
    def writeDouble(v: Double): Unit = {
      var bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write((bits & 0xFF).toInt); bits >>>= 8; i += 1 }
    }
    def writeBytes(b: Array[Byte]): Unit = { writeLong(b.length.toLong); out.write(b) }
    def writeString(s: String): Unit = writeBytes(s.getBytes(UTF_8))
    def writeRaw(b: Array[Byte]): Unit = out.write(b)
  }

  final class Decoder(in: InputStream) {
    def readLong(): Long = {
      var n = 0L; var shift = 0; var b = in.read()
      if (b < 0) throw new EOFException("avro: EOF in varint")
      while ((b & 0x80) != 0) {
        n |= (b & 0x7FL) << shift; shift += 7
        b = in.read()
        if (b < 0) throw new EOFException("avro: EOF in varint")
      }
      n |= (b & 0x7FL) << shift
      (n >>> 1) ^ -(n & 1) // un-zigzag
    }
    def readInt(): Int = readLong().toInt
    def readBool(): Boolean = in.read() == 1
    def readFloat(): Float = {
      val b = readNBytes(4)
      java.lang.Float.intBitsToFloat(
        (b(0) & 0xFF) | ((b(1) & 0xFF) << 8) | ((b(2) & 0xFF) << 16) | ((b(3) & 0xFF) << 24))
    }
    def readDouble(): Double = {
      val b = readNBytes(8)
      var bits = 0L; var i = 7
      while (i >= 0) { bits = (bits << 8) | (b(i) & 0xFFL); i -= 1 }
      java.lang.Double.longBitsToDouble(bits)
    }
    def readBytes(): Array[Byte] = readNBytes(readLong().toInt)
    def readString(): String = new String(readBytes(), UTF_8)
    def skipBytes(): Unit = skipN(readLong())
    def skipN(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val s = in.skip(left)
        if (s <= 0) { if (in.read() < 0) throw new EOFException("avro: EOF in skip"); left -= 1 }
        else left -= s
      }
    }
    def readNBytes(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n); var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new EOFException("avro: EOF in fixed read")
        off += r
      }
      buf
    }
  }

  // ---- container framing ----------------------------------------------

  val Magic: Array[Byte] = Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte)

  /** Deterministic per-file sync marker (spec only requires consistency
    * within the file): md5 of schema JSON + a caller salt.
    */
  def syncMarker(schemaJson: String, salt: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest((schemaJson + "|" + salt).getBytes(UTF_8))

  def writeHeader(out: OutputStream, schemaJson: String, codec: String,
                  sync: Array[Byte]): Unit = {
    out.write(Magic)
    val e = new Encoder(out)
    e.writeLong(2) // one meta-map block of 2 entries
    e.writeString("avro.schema"); e.writeBytes(schemaJson.getBytes(UTF_8))
    e.writeString("avro.codec"); e.writeBytes(codec.getBytes(UTF_8))
    e.writeLong(0) // map terminator
    out.write(sync)
  }

  /** Reads the header; returns (schema json, codec, sync marker). */
  def readHeader(d: Decoder): (String, String, Array[Byte]) = {
    val magic = d.readNBytes(4)
    require(magic.sameElements(Magic), "avro: bad magic")
    var schema: String = null
    var codec = "null"
    var count = d.readLong()
    while (count != 0) {
      val n = if (count < 0) { d.readLong(); -count } else count
      var i = 0L
      while (i < n) {
        val key = d.readString()
        val value = d.readBytes()
        key match {
          case "avro.schema" => schema = new String(value, UTF_8)
          case "avro.codec" => codec = new String(value, UTF_8)
          case _ => ()
        }
        i += 1
      }
      count = d.readLong()
    }
    require(schema != null, "avro: header missing avro.schema")
    (schema, codec, d.readNBytes(16))
  }

  def deflate(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(b.length / 2 + 64)
    val dos = new DeflaterOutputStream(bos, new Deflater(Deflater.DEFAULT_COMPRESSION, true))
    dos.write(b); dos.finish(); dos.close()
    bos.toByteArray
  }

  def inflate(b: Array[Byte]): InputStream =
    new InflaterInputStream(new java.io.ByteArrayInputStream(b), new Inflater(true))

  // ---- record encode (external Row -> avro binary) ---------------------

  private def encodeValue(e: Encoder, t: AvType, v: Any): Unit = t match {
    case ABool => e.writeBool(v.asInstanceOf[Boolean])
    case AInt => e.writeInt(v match {
      case b: Byte => b.toInt; case s: Short => s.toInt; case i: Int => i
    })
    case ALong => e.writeLong(v.asInstanceOf[Long])
    case AFloat => e.writeFloat(v.asInstanceOf[Float])
    case ADouble => e.writeDouble(v.asInstanceOf[Double])
    case AString => e.writeString(v.toString)
    case ABytes => e.writeBytes(v.asInstanceOf[Array[Byte]])
    case ADate => e.writeInt(v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
      case d: java.time.LocalDate => d.toEpochDay.toInt
    })
    case ATimestampMicros => e.writeLong(v match {
      case t: java.sql.Timestamp =>
        // floorDiv: pre-epoch timestamps have negative millis but
        // non-negative sub-second nanos — plain `/` truncates toward zero
        // and shifts them forward a second
        Math.floorDiv(t.getTime, 1000L) * 1000000 + t.getNanos / 1000
      case i: java.time.Instant =>
        i.getEpochSecond * 1000000 + i.getNano / 1000
    })
    case ADecimal(_, scale) =>
      val jd = v match {
        case d: JBigDecimal => d; case d: BigDecimal => d.underlying
      }
      e.writeBytes(jd.setScale(scale).unscaledValue.toByteArray)
    case AArray(et, itemsNullable) =>
      val seq = v.asInstanceOf[scala.collection.Seq[Any]]
      if (seq.nonEmpty) {
        e.writeLong(seq.length.toLong)
        seq.foreach { item =>
          if (itemsNullable) {
            if (item == null) e.writeLong(0)
            else { e.writeLong(1); encodeValue(e, et, item) }
          } else encodeValue(e, et, item)
        }
      }
      e.writeLong(0)
    case ARecord(_, fields) =>
      val row = v.asInstanceOf[Row]
      fields.zipWithIndex.foreach { case (f, i) =>
        encodeField(e, f, if (row.isNullAt(i)) null else row.get(i))
      }
    case ANull => ()
  }

  private def encodeField(e: Encoder, f: AvField, v: Any): Unit =
    if (f.nullable) {
      if (v == null) e.writeLong(0)
      else { e.writeLong(1); encodeValue(e, f.tpe, v) } // branch 1 = T
    } else encodeValue(e, f.tpe, v)

  def encodeRow(e: Encoder, rec: ARecord, row: Row): Unit =
    rec.fields.zipWithIndex.foreach { case (f, i) =>
      encodeField(e, f, if (row.isNullAt(i)) null else row.get(i))
    }

  // ---- record encode (Catalyst InternalRow -> avro binary) ------------
  // The DSV2 write path hands us InternalRow; encoding straight off the
  // specialized getters avoids a per-row external-Row conversion.

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.SpecializedGetters

  def encodeInternal(e: Encoder, schema: StructType, row: InternalRow): Unit = {
    var i = 0
    while (i < schema.fields.length) {
      val f = schema.fields(i)
      if (f.nullable) {
        if (row.isNullAt(i)) e.writeLong(0)
        else { e.writeLong(1); encodeInternalValue(e, f.dataType, row, i) }
      } else encodeInternalValue(e, f.dataType, row, i)
      i += 1
    }
  }

  private def encodeInternalValue(e: Encoder, dt: DataType,
                                  g: SpecializedGetters, i: Int): Unit = dt match {
    case BooleanType => e.writeBool(g.getBoolean(i))
    case ByteType => e.writeInt(g.getByte(i).toInt)
    case ShortType => e.writeInt(g.getShort(i).toInt)
    case IntegerType | DateType => e.writeInt(g.getInt(i))
    case LongType | TimestampType => e.writeLong(g.getLong(i))
    case FloatType => e.writeFloat(g.getFloat(i))
    case DoubleType => e.writeDouble(g.getDouble(i))
    case StringType => e.writeBytes(g.getUTF8String(i).getBytes)
    case BinaryType => e.writeBytes(g.getBinary(i))
    case d: DecimalType =>
      e.writeBytes(g.getDecimal(i, d.precision, d.scale)
        .toJavaBigDecimal.setScale(d.scale).unscaledValue.toByteArray)
    case ArrayType(et, containsNull) =>
      val arr = g.getArray(i)
      if (arr.numElements() > 0) {
        e.writeLong(arr.numElements().toLong)
        var j = 0
        while (j < arr.numElements()) {
          if (containsNull) {
            if (arr.isNullAt(j)) e.writeLong(0)
            else { e.writeLong(1); encodeInternalValue(e, et, arr, j) }
          } else encodeInternalValue(e, et, arr, j)
          j += 1
        }
      }
      e.writeLong(0)
    case st: StructType =>
      encodeInternal(e, st, g.getStruct(i, st.fields.length))
    case other =>
      throw new UnsupportedOperationException(s"avro: unsupported write type $other")
  }

  // ---- distributed writer ---------------------------------------------

  /** Writes `df` as one container file per partition under `dir`
    * (part-NNNNN.avro), via the Hadoop FS API so the same code targets
    * file:// locally and HDFS/object stores on a cluster. Codec
    * "null" | "deflate". Rows-per-block bounds block memory at scale.
    */
  def write(df: DataFrame, dir: String, codec: String = "deflate",
            rowsPerBlock: Int = 4096): Unit = {
    require(codec == "null" || codec == "deflate", s"avro: codec $codec")
    val rec = toAvro(df.schema)
    val json = schemaJson(rec)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new HPath(dir)
    val fs0 = dirPath.getFileSystem(hconf.value)
    if (fs0.exists(dirPath)) fs0.delete(dirPath, true)
    fs0.mkdirs(dirPath)
    df.rdd.mapPartitionsWithIndex { case (pid, rows) =>
      val fs = new HPath(dir).getFileSystem(hconf.value)
      val file = new HPath(dir, f"part-$pid%05d.avro")
      val out = fs.create(file, true)
      try {
        val sync = syncMarker(json, pid.toString)
        writeHeader(out, json, codec, sync)
        val buf = new ByteArrayOutputStream(1 << 16)
        val be = new Encoder(buf)
        var n = 0
        def flush(): Unit = if (n > 0) {
          val raw = buf.toByteArray
          val payload = if (codec == "deflate") deflate(raw) else raw
          val e = new Encoder(out)
          e.writeLong(n.toLong); e.writeBytes(payload)
          out.write(sync)
          buf.reset(); n = 0
        }
        rows.foreach { r => encodeRow(be, rec, r); n += 1; if (n >= rowsPerBlock) flush() }
        flush()
      } finally out.close()
      Iterator.single(1)
    }.count(): Unit
  }
}
