package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.server.ChProto

/** Wire-codec round-trip: randomized typed rows (fixed seed) encode to a
  * native Data block and decode back bit-exactly — including null maps,
  * the UInt64/Decimal(20,0) full range, wide-decimal-as-text, and the
  * second-granularity DateTime wire format.
  */
class ChProtoSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("i8", ByteType, nullable = true),
    StructField("i16", ShortType, nullable = true),
    StructField("i32", IntegerType, nullable = true),
    StructField("i64", LongType, nullable = true),
    StructField("f32", FloatType, nullable = false),
    StructField("f64", DoubleType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("d", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("dec", DecimalType(9, 2), nullable = true),
    StructField("u64", DecimalType(20, 0), nullable = true),
    StructField("wide", DecimalType(30, 4), nullable = true)))

  private def randomRows(n: Int): Seq[Row] = {
    val rnd = new scala.util.Random(42)
    def opt[A](v: => A): Any = if (rnd.nextInt(10) == 0) null else v
    (1 to n).map { _ =>
      Row(
        opt(rnd.nextInt().toByte),
        opt(rnd.nextInt().toShort),
        opt(rnd.nextInt()),
        opt(rnd.nextLong()),
        java.lang.Float.intBitsToFloat(rnd.nextInt()) match {
          case f if f.isNaN => 1.5f
          case f => f
        },
        opt(rnd.nextDouble() * 1e6 - 5e5),
        opt(Seq("héllo", "wörld", "", "a;b\nc", rnd.nextInt().toString)(rnd.nextInt(5))),
        opt(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(rnd.nextInt(30000).toLong))),
        // DateTime rides as u32 epoch seconds: whole-second instants only
        opt(java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(rnd.nextInt(Int.MaxValue).toLong))),
        opt(new java.math.BigDecimal(java.math.BigInteger.valueOf(
          rnd.nextInt(1000000000).toLong - 500000000L), 2)),
        opt(new java.math.BigDecimal(
          new java.math.BigInteger(64, new java.util.Random(rnd.nextLong())))),
        opt(new java.math.BigDecimal(
          new java.math.BigInteger(90, new java.util.Random(rnd.nextLong())), 4)))
    }
  }

  test("data block encode/decode round-trips typed rows exactly") {
    val rows = randomRows(300)
    val bos = new ByteArrayOutputStream()
    ChProto.writeDataBlock(bos, schema, rows)
    val in = new ByteArrayInputStream(bos.toByteArray)
    assert(ChProto.readVarint(in) === ChProto.Server.Data)
    val block = ChProto.readDataBlock(in)
    assert(block.nRows === rows.length)
    assert(in.available() === 0, "trailing bytes after block")

    val back = ChProto.blockToRows(block, schema)
    rows.zip(back).zipWithIndex.foreach { case ((exp, got), r) =>
      schema.fields.indices.foreach { c =>
        val (e, g) = (exp.get(c), got.get(c))
        val pair = (e, g)
        pair match {
          case (null, gg) => assert(gg == null, s"row $r col $c: expected null, got $gg")
          case (ed: java.math.BigDecimal, gd: java.math.BigDecimal) =>
            assert(ed.compareTo(gd) == 0, s"row $r col $c: $ed != $gd")
          case _ => assert(e === g, s"row $r col $c")
        }
      }
    }
    // the full unsigned range survives (2^64-1 through the u64 wire form)
    val max = Row(1.toByte, 1.toShort, 1, 1L, 1f, 1d, "m",
      java.sql.Date.valueOf("2020-01-01"),
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1)),
      new java.math.BigDecimal("1.00"),
      new java.math.BigDecimal("18446744073709551615"),
      new java.math.BigDecimal("123456789012345678901234.5678"))
    val b2 = new ByteArrayOutputStream()
    ChProto.writeDataBlock(b2, schema, Seq(max))
    val in2 = new ByteArrayInputStream(b2.toByteArray)
    ChProto.readVarint(in2)
    val back2 = ChProto.blockToRows(ChProto.readDataBlock(in2), schema)
    assert(back2.head.getDecimal(10).toPlainString === "18446744073709551615")
    assert(back2.head.getDecimal(11).toPlainString === "123456789012345678901234.5678")
  }

  test("Array(T) columns round-trip: offsets + flattened inner column") {
    val aschema = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("xs", ArrayType(IntegerType, containsNull = false),
        nullable = false),
      StructField("ss", ArrayType(StringType, containsNull = true),
        nullable = true),
      StructField("nested", ArrayType(ArrayType(LongType, containsNull = false),
        containsNull = false), nullable = false)))
    val rows = Seq(
      Row(1, Seq(1, 2, 3), Seq("a", null, "c"), Seq(Seq(1L, 2L), Seq(3L))),
      Row(2, Seq.empty[Int], Seq.empty[String], Seq.empty[Seq[Long]]),
      // a NULL array column degrades to [] on the wire (CH has no
      // Nullable(Array)) — the documented fromSpark contract
      Row(3, Seq(42), null, Seq(Seq.empty[Long], Seq(7L, 8L, 9L))))
    val bos = new ByteArrayOutputStream()
    ChProto.writeDataBlock(bos, aschema, rows)
    val in = new ByteArrayInputStream(bos.toByteArray)
    assert(ChProto.readVarint(in) === ChProto.Server.Data)
    val block = ChProto.readDataBlock(in)
    assert(in.available() === 0, "trailing bytes after block")
    assert(block.columns.map(_.chType) === Vector(
      "Int32", "Array(Int32)", "Array(Nullable(String))", "Array(Array(Int64))"))

    val back = ChProto.blockToRows(block, aschema)
    assert(back(0).getSeq[Int](1) === Seq(1, 2, 3))
    assert(back(0).getSeq[String](2) === Seq("a", null, "c"))
    assert(back(0).getSeq[Seq[Long]](3) === Seq(Seq(1L, 2L), Seq(3L)))
    assert(back(1).getSeq[Int](1) === Seq.empty)
    assert(back(2).getSeq[Int](1) === Seq(42))
    assert(back(2).getSeq[String](2) === Seq.empty) // null degraded to []
    assert(back(2).getSeq[Seq[Long]](3) === Seq(Seq.empty, Seq(7L, 8L, 9L)))
  }
}
