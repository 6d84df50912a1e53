package graft.types

import java.util.Locale

import org.apache.spark.sql.types._

/** ClickHouse/BQL type system → Spark DataType mapping — SURVEY.md §1.2.
  *
  * Mirrors the reference's `BqlType` (crates/meta/src/types.rs:94-111, parse
  * surface :213-247 and grammar crates/lang/src/bql.pest:359-391) as an ADT
  * with a bidirectional Spark mapping. Spark has no unsigned integers, so
  * UInt types widen (UInt64 → Decimal(20,0)) — value-preserving, with the
  * declared CH type kept alongside for DESC/SHOW fidelity.
  */
sealed abstract class BqlType(val chName: String) {
  def sparkType: DataType
  override def toString: String = chName
}

object BqlType {
  case object Int8 extends BqlType("Int8") { val sparkType = ByteType }
  case object Int16 extends BqlType("Int16") { val sparkType = ShortType }
  case object Int32 extends BqlType("Int32") { val sparkType = IntegerType }
  case object Int64 extends BqlType("Int64") { val sparkType = LongType }
  case object UInt8 extends BqlType("UInt8") { val sparkType = ShortType }
  case object UInt16 extends BqlType("UInt16") { val sparkType = IntegerType }
  case object UInt32 extends BqlType("UInt32") { val sparkType = LongType }
  case object UInt64 extends BqlType("UInt64") {
    val sparkType = DecimalType(20, 0)
  }
  case object Float32 extends BqlType("Float32") { val sparkType = FloatType }
  case object Float64 extends BqlType("Float64") { val sparkType = DoubleType }
  // Float16 parses in the reference but is unusable (no Arrow array,
  // crates/engine/src/datafusions.rs:237-240) — widen to Float32's mapping.
  case object Float16 extends BqlType("Float16") { val sparkType = FloatType }
  final case class Decimal(p: Int, s: Int)
      extends BqlType(s"Decimal($p, $s)") {
    val sparkType = DecimalType(p, s)
  }
  case object Date extends BqlType("Date") { val sparkType = DateType }
  final case class DateTime(tz: Option[String])
      extends BqlType(tz.fold("DateTime")(z => s"DateTime('$z')")) {
    val sparkType = TimestampType
  }
  case object Str extends BqlType("String") { val sparkType = StringType }
  final case class FixedString(n: Int) extends BqlType(s"FixedString($n)") {
    val sparkType = BinaryType
  }
  final case class LowCardinality(inner: BqlType)
      extends BqlType(s"LowCardinality(${inner.chName})") {
    // Dictionary encoding is a storage detail; parquet dictionary-encodes
    // strings anyway (and keeps the dictionary, unlike the reference's fork
    // which degrades LowCardinality to raw codes on query).
    val sparkType = inner.sparkType
  }
  case object Uuid extends BqlType("UUID") { val sparkType = StringType }
  final case class Nullable(inner: BqlType)
      extends BqlType(s"Nullable(${inner.chName})") {
    val sparkType = inner.sparkType
  }
  /** ClickHouse Array(T). CH forbids Nullable(Array(..)) — nullability
    * lives on the ELEMENT type only, which maps to Spark's containsNull.
    */
  final case class Arr(inner: BqlType) extends BqlType(s"Array(${inner.chName})") {
    val sparkType = ArrayType(inner.sparkType, inner.isInstanceOf[Nullable])
  }

  /** ClickHouse SimpleAggregateFunction(f, T) — an AggregatingMergeTree
    * column whose merge combines values with `f` (the current value IS
    * the state, unlike full AggregateFunction states). Storage-wise it is
    * just T; the function name drives the FINAL/OPTIMIZE merge.
    */
  final case class SimpleAggFn(func: String, inner: BqlType)
      extends BqlType(s"SimpleAggregateFunction($func, ${inner.chName})") {
    val sparkType = inner.sparkType
  }

  /** Max decimal precision the reference's storage accepts
    * (crates/meta/src/types.rs:145-153 — ≤9 → 4 bytes, ≤18 → 8 bytes;
    * the grammar admits up to 76 but storage rejects >18).
    */
  val MaxDecimalPrecision = 18

  /** Parse a ClickHouse type name (case-sensitive like the reference's
    * parser, crates/meta/src/types.rs:213-247). Whitespace inside
    * parameter lists is tolerated.
    */
  def parse(input: String): Either[String, BqlType] = {
    val s = input.trim
    def intArg(args: String): Either[String, Int] =
      try Right(args.trim.toInt)
      catch { case _: NumberFormatException => Left(s"bad int arg in: $input") }

    def withArgs(prefix: String): Option[String] =
      if (s.startsWith(prefix + "(") && s.endsWith(")"))
        Some(s.substring(prefix.length + 1, s.length - 1))
      else None

    s match {
      case "Int8" => Right(Int8)
      case "Int16" => Right(Int16)
      case "Int32" => Right(Int32)
      case "Int64" => Right(Int64)
      case "UInt8" => Right(UInt8)
      case "UInt16" => Right(UInt16)
      case "UInt32" => Right(UInt32)
      case "UInt64" => Right(UInt64)
      case "Float16" => Right(Float16)
      case "Float32" => Right(Float32)
      case "Float64" => Right(Float64)
      case "Date" => Right(Date)
      case "DateTime" => Right(DateTime(None))
      case "String" => Right(Str)
      case "UUID" => Right(Uuid)
      case _ =>
        withArgs("Nullable").map(a => parse(a).map(Nullable(_)))
          .orElse(withArgs("Array").map(a => parse(a).map(Arr(_))))
          .orElse(withArgs("LowCardinality").map(a => parse(a).map(LowCardinality(_))))
          .orElse(withArgs("FixedString").map(a => intArg(a).flatMap { n =>
            if (n >= 1 && n <= 255) Right(FixedString(n))
            else Left(s"FixedString length out of range 1..255: $n")
          }))
          .orElse(withArgs("DateTime").map { a =>
            val t = a.trim
            if (t.length >= 2 && t.head == '\'' && t.last == '\'')
              Right(DateTime(Some(t.substring(1, t.length - 1))))
            else Left(s"bad DateTime timezone: $input")
          })
          .orElse(withArgs("Decimal32").map(a => intArg(a).flatMap(mkDecimal(9, _))))
          .orElse(withArgs("Decimal64").map(a => intArg(a).flatMap(mkDecimal(18, _))))
          .orElse(withArgs("SimpleAggregateFunction").map { a =>
            a.split(",", 2) match {
              case Array(f, t) =>
                val fn = f.trim
                val allowed = Set("sum", "min", "max", "any", "anyLast",
                  "groupBitAnd", "groupBitOr", "groupBitXor")
                if (!allowed.contains(fn))
                  Left(s"SimpleAggregateFunction: unsupported function $fn " +
                    s"(supported: ${allowed.toSeq.sorted.mkString(", ")})")
                else parse(t).map(SimpleAggFn(fn, _))
              case _ =>
                Left(s"SimpleAggregateFunction expects (func, T): $input")
            }
          })
          .orElse(withArgs("Decimal").map { a =>
            a.split(",") match {
              case Array(p, sc) =>
                for {
                  pp <- intArg(p)
                  ss <- intArg(sc)
                  d <- mkDecimal(pp, ss)
                } yield d
              case _ => Left(s"Decimal expects (P, S): $input")
            }
          })
          .getOrElse(Left(s"unknown type: $input"))
    }
  }

  private def mkDecimal(p: Int, s: Int): Either[String, Decimal] =
    // Match the reference's storage limits, not its grammar: P ≤ 18
    // (crates/runtime reads reject wider), S ≤ P.
    if (p < 1 || p > MaxDecimalPrecision) Left(s"Decimal precision out of range 1..$MaxDecimalPrecision: $p")
    else if (s < 0 || s > p) Left(s"Decimal scale out of range 0..$p: $s")
    else Right(Decimal(p, s))

  /** The CH type a Spark DataType round-trips to (used when deriving DDL
    * from existing DataFrames; lossy for the unsigned widenings by design).
    */
  def fromSpark(dt: DataType, nullable: Boolean = false): BqlType = {
    val base = dt match {
      case ByteType => Int8
      case ShortType => Int16
      case IntegerType => Int32
      case LongType => Int64
      case FloatType => Float32
      case DoubleType => Float64
      case d: DecimalType => Decimal(d.precision min MaxDecimalPrecision, d.scale)
      case DateType => Date
      case TimestampType => DateTime(None)
      // Spark 4 reads parquet timestamp[ns] as TIMESTAMP_NTZ; the session
      // is pinned UTC, so mapping it to DateTime is value-preserving
      // (RuntimeAssumptionsSpec pins the read shape).
      case TimestampNTZType => DateTime(None)
      case StringType => Str
      case BinaryType => Str
      case ArrayType(et, containsNull) => Arr(fromSpark(et, containsNull))
      case other => throw new IllegalArgumentException(
        s"no ClickHouse equivalent for Spark type: $other")
    }
    // CH has no Nullable(Array): a NULL array column degrades to [] on
    // the wire; element nulls ride inside Arr's inner Nullable.
    if (nullable && !base.isInstanceOf[Arr]) Nullable(base) else base
  }
}
