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
  /** ClickHouse Date32 — 4-byte signed days since epoch (range beyond
    * Date's u16 1970..2149). Spark DateType is 4-byte days natively, so
    * the mapping is exact. Absent from the reference (its fork has only
    * the 2-byte Date16) but standard in every modern CH deployment.
    */
  case object Date32 extends BqlType("Date32") { val sparkType = DateType }
  final case class DateTime(tz: Option[String])
      extends BqlType(tz.fold("DateTime")(z => s"DateTime('$z')")) {
    val sparkType = TimestampType
  }
  /** ClickHouse DateTime64(precision[, tz]) — Int64 ticks at 10^-precision
    * seconds. Spark TimestampType is microseconds: precision ≤ 6 maps
    * exactly; 7..9 (ns) parse and store with documented truncation to µs
    * (same contract as Spark's own parquet timestamp[ns] read).
    */
  final case class DateTime64(precision: Int, tz: Option[String])
      extends BqlType(tz.fold(s"DateTime64($precision)")(z =>
        s"DateTime64($precision, '$z')")) {
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

  /** ClickHouse Enum8/Enum16 — a named-value domain. Stored as its NAMES
    * (parquet dictionary-encodes the strings; CH's numeric backing is a
    * storage detail its own clients rarely see), so comparisons, GROUP
    * BY and output match CH's default name-typed behavior.
    */
  final case class Enum(width: Int, entries: Seq[(String, Int)])
      extends BqlType(s"Enum$width(" + entries.map { case (n, v) =>
        s"'${n.replace("'", "''")}' = $v" }.mkString(", ") + ")") {
    val sparkType = StringType
  }

  /** ClickHouse Map(K, V) → Spark MapType. */
  final case class ChMap(k: BqlType, v: BqlType)
      extends BqlType(s"Map(${k.chName}, ${v.chName})") {
    val sparkType = MapType(k.sparkType, v.sparkType,
      v.isInstanceOf[Nullable])
  }

  /** ClickHouse Tuple — unnamed `Tuple(T1, T2)` maps onto a struct with
    * CH's positional accessors as field names (`_1`, `_2` — usable from
    * SQL as t.`_1`); named `Tuple(a T1, b T2)` keeps its names.
    */
  final case class ChTuple(fields: Seq[(String, BqlType)], named: Boolean)
      extends BqlType("Tuple(" + fields.map { case (n, t) =>
        if (named) s"$n ${t.chName}" else t.chName }.mkString(", ") + ")") {
    val sparkType = StructType(fields.map { case (n, t) =>
      StructField(n, t.sparkType, t.isInstanceOf[Nullable])
    }.toIndexedSeq)
  }

  /** ClickHouse `Nested(a T, b U)` — a named family of PARALLEL ARRAYS.
    * Storage flattens it exactly as CH does with flatten_nested=1 (the
    * default): the table physically holds `n.a Array(T)`, `n.b Array(U)`
    * with per-row equal-length enforcement; DESC shows the flattened
    * columns while SHOW CREATE keeps the Nested form. Not in the
    * reference (its grammar has no array types at all,
    * crates/lang/src/bql.pest:359-391) — CH-dialect completion. The
    * sparkType below is only the logical array-of-struct view (used by
    * DESC(SELECT)-style derivations); table DDL never stores it — the
    * expansion happens before the Spark schema is built.
    */
  final case class Nested(fields: Seq[(String, BqlType)])
      extends BqlType("Nested(" + fields.map { case (n, t) =>
        s"$n ${t.chName}" }.mkString(", ") + ")") {
    val sparkType = ArrayType(StructType(fields.map { case (n, t) =>
      StructField(n, t.sparkType, t.isInstanceOf[Nullable])
    }.toIndexedSeq), containsNull = false)
  }

  case object IPv4 extends BqlType("IPv4") { val sparkType = StringType }
  case object IPv6 extends BqlType("IPv6") { val sparkType = StringType }

  /** ClickHouse SimpleAggregateFunction(f, T) — an AggregatingMergeTree
    * column whose merge combines values with `f` (the current value IS
    * the state, unlike full AggregateFunction states). Storage-wise it is
    * just T; the function name drives the FINAL/OPTIMIZE merge.
    */
  final case class SimpleAggFn(func: String, inner: BqlType)
      extends BqlType(s"SimpleAggregateFunction($func, ${inner.chName})") {
    val sparkType = inner.sparkType
  }

  /** ClickHouse AggregateFunction(f, T…) — a column holding the aggregate
    * function's STATE (CH serializes an opaque internal state; here each
    * state is a TRANSPARENT Spark value chosen so plain Catalyst
    * aggregates implement `fState` / `fMerge` / the FINAL merge exactly):
    * sum/min/max → the running value, count → the running count,
    * avg → struct(s Float64, c Int64), uniqExact → the sorted
    * distinct-value array (exact by construction; set-union merge),
    * argMax/argMin(T, U) → struct(o U, a T) with lexicographic
    * min/max merge, avgWeighted(T, W) → struct(s sumT, w sumW),
    * sumIf/countIf → the running (filtered) sum/count, topK(k)(T) → the
    * full SpaceSaving summary array<struct(value, count, error)>.
    */
  final case class AggFn(func: String, inners: Seq[BqlType])
      extends BqlType(
        s"AggregateFunction($func${inners.map(", " + _.chName).mkString})") {
    val sparkType = AggFn.stateType(func, inners)
    def inner: Option[BqlType] = inners.headOption
  }

  object AggFn {
    val supported: Set[String] =
      Set("sum", "count", "min", "max", "avg", "uniqExact", "uniq",
        "quantileTDigest", "argMax", "argMin", "avgWeighted", "sumIf",
        "countIf")

    /** Parametric functions accepted as the f of AggregateFunction(f, T):
      * name(base) extracted, integer params preserved in chName.
      */
    private[types] def parametricBase(f: String): Option[(String, Seq[Int])] = {
      val i = f.indexOf('(')
      if (i < 0 || !f.endsWith(")")) None
      else {
        val base = f.substring(0, i).trim
        val args = f.substring(i + 1, f.length - 1).split(",").map(_.trim)
        if (base == "topK" && args.length == 1 && args(0).forall(_.isDigit)
            && args(0).nonEmpty)
          Some((base, Seq(args(0).toInt)))
        else None
      }
    }

    private[BqlType] def stateType(func: String, inners: Seq[BqlType]): DataType = {
      val inner = inners.headOption
      func match {
        case "count" | "countIf" => LongType
        // avg state keeps the sum in the INPUT's exact sum type (decimal
        // stays decimal) so merge results cannot depend on row order
        case "avg" => StructType(Seq(
          StructField("s", stateType("sum", inners), nullable = true),
          StructField("c", LongType, nullable = true)))
        // avgWeighted(T, W) keeps BOTH running sums exact in their own
        // sum types (Σ x·w in T's sum type, Σ w in W's); the division to
        // Float64 happens once, in avgWeightedMerge — merged averages
        // cannot drift with row or partition order
        case "avgWeighted" => StructType(Seq(
          StructField("s", stateType("sum", inners.take(1)), nullable = true),
          StructField("w", stateType("sum", inners.drop(1)), nullable = true)))
        // argMax/argMin(T, U): struct(o U, a T) — the ORDERING value
        // first, so plain lexicographic min/max over the struct IS the
        // state merge (deterministic tie-break on the arg, within CH's
        // any-of-the-tied contract)
        case "argMax" | "argMin" => StructType(Seq(
          StructField("o", inners.drop(1).headOption.map(_.sparkType)
            .getOrElse(StringType), nullable = true),
          StructField("a", inner.map(_.sparkType).getOrElse(StringType),
            nullable = true)))
        case "uniqExact" =>
          ArrayType(inner.map(_.sparkType).getOrElse(StringType),
            containsNull = false)
        // uniq: a Datasketches HLL sketch blob (bounded approximate state)
        case "uniq" => BinaryType
        // quantileTDigest: bounded (mean, weight) centroid digest
        // (graft.functions.TDigest — ≤ ~2·δ entries, mergeable)
        case "quantileTDigest" => ArrayType(StructType(Seq(
          StructField("_1", DoubleType, nullable = false),
          StructField("_2", DoubleType, nullable = false))),
          containsNull = false)
        case "min" | "max" => inner.map(_.sparkType).getOrElse(StringType)
        case "sum" | "sumIf" => inner.map(_.sparkType) match {
          case Some(_: DecimalType) =>
            val d = inner.get.sparkType.asInstanceOf[DecimalType]
            DecimalType(math.min(38, d.precision + 10), d.scale)
          case Some(FloatType | DoubleType) => DoubleType
          case _ => LongType // CH sums integrals into Int64/UInt64
        }
        case pf if parametricBase(pf).exists(_._1 == "topK") =>
          // the FULL SpaceSaving summary (value, count, error) — k only
          // bounds the READ; the state carries the whole bounded summary
          // so merges stay within the Parallel SpaceSaving error contract
          ArrayType(StructType(Seq(
            StructField("_1", inner.map(_.sparkType).getOrElse(StringType),
              nullable = true),
            StructField("_2", LongType, nullable = false),
            StructField("_3", LongType, nullable = false))),
            containsNull = false)
        case other => throw new IllegalArgumentException(
          s"AggregateFunction: unsupported function $other")
      }
    }
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
      case "Date32" => Right(Date32)
      case "DateTime" => Right(DateTime(None))
      case "DateTime64" => Right(DateTime64(3, None)) // CH's default precision
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
          .orElse(withArgs("DateTime64").map { a =>
            def tzOf(t: String): Either[String, Option[String]] =
              if (t.isEmpty) Right(None)
              else if (t.length >= 2 && t.head == '\'' && t.last == '\'')
                Right(Some(t.substring(1, t.length - 1)))
              else Left(s"bad DateTime64 timezone: $input")
            splitTopLevel(a) match {
              case Seq(p) => for {
                pp <- intArg(p)
                _ <- if (pp >= 0 && pp <= 9) Right(())
                     else Left(s"DateTime64 precision out of range 0..9: $pp")
              } yield DateTime64(pp, None)
              case Seq(p, tz) => for {
                pp <- intArg(p)
                _ <- if (pp >= 0 && pp <= 9) Right(())
                     else Left(s"DateTime64 precision out of range 0..9: $pp")
                z <- tzOf(tz.trim)
              } yield DateTime64(pp, z)
              case _ => Left(s"DateTime64 expects (precision[, 'tz']): $input")
            }
          })
          .orElse(withArgs("Decimal32").map(a => intArg(a).flatMap(mkDecimal(9, _))))
          .orElse(withArgs("Decimal64").map(a => intArg(a).flatMap(mkDecimal(18, _))))
          .orElse(withArgs("Enum8").map(a => parseEnum(8, a, input)))
          .orElse(withArgs("Enum16").map(a => parseEnum(16, a, input)))
          .orElse(withArgs("Enum").map(a => parseEnum(8, a, input)))
          .orElse(withArgs("Map").map { a =>
            splitTopLevel(a) match {
              case Seq(k, v) => for {
                kt <- parse(k)
                vt <- parse(v)
              } yield ChMap(kt, vt)
              case _ => Left(s"Map expects (K, V): $input")
            }
          })
          .orElse(withArgs("Tuple").map { a =>
            val parts = splitTopLevel(a)
            if (parts.isEmpty) Left(s"Tuple expects at least one type: $input")
            else {
              val named = parts.forall(_.trim.matches(
                "[A-Za-z_][A-Za-z0-9_]*\\s+\\S.*"))
              val fields = parts.zipWithIndex.map { case (pRaw, i) =>
                val t = pRaw.trim
                if (named) {
                  val Array(n, rest) = t.split("\\s+", 2)
                  parse(rest).map(bt => (n, bt))
                } else parse(t).map(bt => (s"_${i + 1}", bt))
              }
              fields.collectFirst { case Left(e) => Left(e) }.getOrElse(
                Right(ChTuple(fields.map(_.toOption.get), named)))
            }
          })
          .orElse(withArgs("Nested").map { a =>
            val parts = splitTopLevel(a)
            if (parts.isEmpty) Left(s"Nested expects `name Type` fields: $input")
            else {
              val fields = parts.map { pRaw =>
                val t = pRaw.trim
                if (!t.matches("[A-Za-z_][A-Za-z0-9_]*\\s+\\S.*"))
                  Left(s"Nested field must be `name Type`, got `$t`: $input")
                else {
                  val Array(n, rest) = t.split("\\s+", 2)
                  parse(rest).flatMap {
                    case _: Nested =>
                      Left(s"Nested inside Nested is not supported: $input")
                    case bt => Right((n, bt))
                  }
                }
              }
              fields.collectFirst { case Left(e) => Left(e) }.getOrElse(
                Right(Nested(fields.map(_.toOption.get))))
            }
          })
          .orElse(if (s == "IPv4") Some(Right(IPv4)) else None)
          .orElse(if (s == "IPv6") Some(Right(IPv6)) else None)
          .orElse(withArgs("AggregateFunction").map { a =>
            def ok(f: String): Boolean =
              AggFn.supported.contains(f) || AggFn.parametricBase(f).isDefined
            def norm(f: String): String =
              AggFn.parametricBase(f)
                .map { case (b, ps) => s"$b(${ps.mkString(",")})" }
                .getOrElse(f)
            splitTopLevel(a) match {
              case Seq(f) if ok(f.trim) =>
                Right(AggFn(norm(f.trim), Nil))
              case Seq(f, t) if ok(f.trim) =>
                parse(t).map(bt => AggFn(norm(f.trim), Seq(bt)))
              case Seq(f, t1, t2) if ok(f.trim) =>
                for (b1 <- parse(t1); b2 <- parse(t2))
                  yield AggFn(norm(f.trim), Seq(b1, b2))
              case Seq(f, _*) =>
                Left(s"AggregateFunction: unsupported function ${f.trim} " +
                  s"(supported: ${AggFn.supported.toSeq.sorted.mkString(", ")}" +
                  ", topK(k))")
              case _ =>
                Left(s"AggregateFunction expects (func[, T…]): $input")
            }
          })
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

  /** Split a type-parameter list on TOP-LEVEL commas only — nested
    * parameterized types (Map(String, Decimal(10, 2))) keep theirs.
    */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var inStr = false
    s.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case ',' if depth == 0 && !inStr =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def parseEnum(width: Int, args: String,
                        input: String): Either[String, Enum] = {
    val entries = splitTopLevel(args).map { e =>
      e.trim.split("=", 2) match {
        case Array(n0, v0) =>
          val n = n0.trim
          val v = v0.trim
          // width-checked BEFORE toInt: an overflowing literal must be a
          // parse error, not a wrapped Int (ADVICE r15 #4); Enum8 values
          // are -128..127, Enum16 -32768..32767, CH's storage widths
          if (n.length >= 2 && n.head == '\'' && n.last == '\'' &&
              v.matches("-?\\d+")) {
            val (lo, hi) = if (width == 8) (-128L, 127L) else (-32768L, 32767L)
            scala.util.Try(v.toLong).toOption match {
              case Some(x) if x >= lo && x <= hi =>
                Right(n.substring(1, n.length - 1).replace("''", "'") -> x.toInt)
              case _ => Left(s"Enum$width value $v out of range $lo..$hi " +
                s"in: $input")
            }
          } else Left(s"bad Enum entry `$e` in: $input")
        case _ => Left(s"bad Enum entry `$e` in: $input")
      }
    }
    entries.collectFirst { case Left(e) => Left(e) }.getOrElse {
      val es = entries.map(_.toOption.get)
      if (es.isEmpty) Left(s"Enum needs at least one entry: $input")
      else if (es.map(_._2).distinct.length != es.length ||
          es.map(_._1).distinct.length != es.length)
        Left(s"duplicate Enum name or value in: $input")
      else Right(Enum(width, es))
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
      case MapType(kt, vt, valueContainsNull) =>
        ChMap(fromSpark(kt), fromSpark(vt, valueContainsNull))
      case st: StructType =>
        val named = !st.fieldNames.zipWithIndex.forall {
          case (n, i) => n == s"_${i + 1}" }
        ChTuple(st.fields.toSeq.map(f =>
          f.name -> fromSpark(f.dataType, f.nullable)), named)
      case other => throw new IllegalArgumentException(
        s"no ClickHouse equivalent for Spark type: $other")
    }
    // CH has no Nullable(Array/Map/Tuple): a NULL composite column
    // degrades to []/{}/defaults on the wire; element nulls ride inside
    // the inner Nullable.
    if (nullable && !base.isInstanceOf[Arr] && !base.isInstanceOf[ChMap] &&
        !base.isInstanceOf[ChTuple]) Nullable(base)
    else base
  }
}
