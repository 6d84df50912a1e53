package graft

import org.apache.spark.sql.types.{Decimal => _, _}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.types.BqlType
import graft.types.BqlType._

/** Type parsing round-trips, ported from the reference's in-crate tests
  * (crates/meta/src/types.rs:555-782) plus a scalacheck-generated round-trip
  * sweep (raw scalacheck — the scalatestplus bridge is not in the offline
  * cache).
  */
class BqlTypeSpec extends AnyFunSuite {

  test("primitive type names parse") {
    assert(parse("Int8") === Right(Int8))
    assert(parse("UInt64") === Right(UInt64))
    assert(parse("Float64") === Right(Float64))
    assert(parse("String") === Right(Str))
    assert(parse("Date") === Right(Date))
    assert(parse("UUID") === Right(Uuid))
  }

  test("parameterized types parse (types.rs:604-741)") {
    assert(parse("Decimal(9, 2)") === Right(Decimal(9, 2)))
    assert(parse("Decimal(18,4)") === Right(Decimal(18, 4)))
    assert(parse("Decimal32(2)") === Right(Decimal(9, 2)))
    assert(parse("Decimal64(4)") === Right(Decimal(18, 4)))
    assert(parse("FixedString(3)") === Right(FixedString(3)))
    assert(parse("LowCardinality(String)") === Right(LowCardinality(Str)))
    assert(parse("Nullable(Int32)") === Right(Nullable(Int32)))
    assert(parse("Nullable(Decimal(9, 2))") === Right(Nullable(Decimal(9, 2))))
    assert(parse("DateTime") === Right(DateTime(None)))
    assert(parse("DateTime('Etc/GMT+5')") === Right(DateTime(Some("Etc/GMT+5"))))
  }

  test("storage limits are enforced like the reference") {
    // grammar admits P≤76 but storage rejects >18 (types.rs:145-153)
    assert(parse("Decimal(19, 2)").isLeft)
    assert(parse("Decimal(76, 0)").isLeft)
    assert(parse("FixedString(0)").isLeft)
    assert(parse("FixedString(256)").isLeft)
    assert(parse("NotAType").isLeft)
  }

  test("spark mapping per SURVEY §1.2") {
    assert(Int8.sparkType === ByteType)
    assert(UInt8.sparkType === ShortType)
    assert(UInt16.sparkType === IntegerType)
    assert(UInt32.sparkType === LongType)
    assert(UInt64.sparkType === DecimalType(20, 0))
    assert(Decimal(9, 2).sparkType === DecimalType(9, 2))
    assert(Date.sparkType === DateType)
    assert(DateTime(None).sparkType === TimestampType)
    assert(FixedString(3).sparkType === BinaryType)
    assert(LowCardinality(Str).sparkType === StringType)
    assert(Nullable(Int64).sparkType === LongType)
  }

  private val genType: Gen[BqlType] = {
    val prim = Gen.oneOf[BqlType](Int8, Int16, Int32, Int64, UInt8, UInt16,
      UInt32, UInt64, Float32, Float64, Str, Date, DateTime(None), Uuid)
    val dec = for {
      p <- Gen.choose(1, 18); s <- Gen.choose(0, p)
    } yield Decimal(p, s): BqlType
    val fs = Gen.choose(1, 255).map(FixedString(_): BqlType)
    val base = Gen.oneOf(prim, dec, fs)
    Gen.oneOf(base, base.map(Nullable(_)), Gen.const(LowCardinality(Str): BqlType))
  }

  test("chName round-trips through parse (property)") {
    (0 until 300).foreach { i =>
      genType(Gen.Parameters.default, Seed(i.toLong)).foreach { t =>
        assert(parse(t.chName) === Right(t), s"round-trip failed for $t")
      }
    }
  }

  test("Float16 parses, widens to Spark Float, and keeps its CH name " +
    "(the reference parses it but cannot execute it — " +
    "crates/engine/src/datafusions.rs:237-240; strict superset here)") {
    assert(parse("Float16") === Right(Float16))
    assert(Float16.sparkType === FloatType)
    assert(Float16.chName === "Float16")
    assert(parse("Nullable(Float16)") === Right(Nullable(Float16)))
    assert(parse(Nullable(Float16).chName) === Right(Nullable(Float16)))
  }

  test("AggregateFunction multi-param and parametric forms round-trip " +
    "(d32: argMax/avgWeighted/sumIf two-type params, topK(k) parametric)") {
    assert(parse("AggregateFunction(argMax, String, Float64)") ===
      Right(AggFn("argMax", Seq(Str, Float64))))
    assert(parse("AggregateFunction(avgWeighted, Decimal(18, 6), Int64)") ===
      Right(AggFn("avgWeighted", Seq(Decimal(18, 6), Int64))))
    assert(parse("AggregateFunction(sumIf, Int64, UInt8)") ===
      Right(AggFn("sumIf", Seq(Int64, UInt8))))
    assert(parse("AggregateFunction(topK(3), String)") ===
      Right(AggFn("topK(3)", Seq(Str))))
    // chName round-trips
    Seq(AggFn("argMax", Seq(Str, Float64)),
        AggFn("avgWeighted", Seq(Decimal(18, 6), Int64)),
        AggFn("topK(3)", Seq(Str))).foreach { t =>
      assert(parse(t.chName) === Right(t), s"round-trip failed for $t")
    }
    // the state shapes that make plain Catalyst aggregates the merges
    assert(AggFn("argMax", Seq(Str, Float64)).sparkType ===
      StructType(Seq(StructField("o", DoubleType), StructField("a", StringType))))
    assert(AggFn("topK(3)", Seq(Str)).sparkType ===
      ArrayType(StructType(Seq(
        StructField("_1", StringType),
        StructField("_2", LongType, nullable = false),
        StructField("_3", LongType, nullable = false))), containsNull = false))
    // unknown parametric functions still reject loudly
    assert(parse("AggregateFunction(topQ(3), String)").isLeft)
  }
}
