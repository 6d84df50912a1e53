package graft.plans

import java.time.LocalDate

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.EpochCivilField

/** ClickHouse prunes MergeTree parts under predicates like
  * `toYear(d) = 1995` by *monotonic-function index analysis*: the sorting/
  * partition key index stores raw `d` ranges, and CH inverts the monotone
  * civil function to a raw-key range (its `IFunction::getMonotonicityForRange`
  * machinery; see docs/lang.md partition pruning, and the reference's
  * shallow WHERE rewrite crates/lang/src/parse.rs:539-893 which only handles
  * predicates already ON the partition column). Spark has no equivalent:
  * `Year(col) = lit` is opaque to parquet row-group stats, partition
  * pruning, and PartitionPruneDerivation alike — at 100 TB the scan reads
  * every row-group of every file.
  *
  * This rule is the Catalyst-native version of that index analysis. For a
  * conjunct comparing a MONOTONE NON-DECREASING civil shape of a column to
  * literals —
  *
  *   - `toYear(d)` / `year(d)` over DateType ([[Year]]),
  *   - `toYear(ts)` over a fixed-offset timestamp (the
  *     [[graft.functions.EpochCivilField]] form planted by
  *     [[CivilFieldRewrite]]),
  *   - `toYYYYMM(x)` / `toYYYYMMDD(x)` (the `y*100+m` / `y*10000+m*100+d`
  *     compositions both builders emit),
  *   - `toDate(ts)` = `cast(ts AS date)` under a fixed-offset zone,
  *   - `toStartOfYear/Quarter/Month/Week` = `trunc(x, unit)` over dates
  *     and fixed-zone timestamps,
  *   - `toStartOfDay/Hour/Minute` = `date_trunc(unit, ts)` under a fixed
  *     offset
  *
  * — it ANDs in the implied raw-column range (`d >= lo AND d < hi`). The
  * original predicate stays (the derived range is implied, never a
  * replacement, so results cannot change); the new conjunct references the
  * bare column, so it reaches `PushedFilters` (row-group skipping), hidden
  * `__ptk` derivation via [[PartitionPruneDerivation]] (directory pruning —
  * the two rules chain inside the same fixed-point batch), and join
  * pushdown. Region zones with DST are NOT unwrapped: at a fall-back
  * transition the local date can step backwards (e.g. 00:30 → 23:30 the
  * previous day), so instant→date is not monotone and no range is sound.
  */
case class CivilPredicateUnwrap(sparkIgnored: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  import CivilPredicateUnwrap._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjs = splitAnd(cond)
      // derived pieces are emitted PRE-SPLIT (never as And nodes) so the
      // per-conjunct dedupe below reaches a fixed point across iterations
      val derived = conjs.flatMap(derive).flatMap(splitAnd)
        .filterNot(d => conjs.exists(_.semanticEquals(d)))
      val distinctDerived = derived.foldLeft(Vector.empty[Expression]) {
        (acc, d) => if (acc.exists(_.semanticEquals(d))) acc else acc :+ d
      }
      if (distinctDerived.isEmpty) f
      else Filter((conjs ++ distinctDerived).reduceLeft(And), child)
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** The implied raw-column range for one conjunct, if its shape is a
    * monotone civil extraction compared to literals.
    */
  private def derive(e: Expression): Option[Expression] = e match {
    case EqualTo(Shape(s), IntLit(v)) => s.between(v, v)
    case EqualTo(IntLit(v), Shape(s)) => s.between(v, v)
    case EqualNullSafe(Shape(s), IntLit(v)) => s.between(v, v)
    case EqualNullSafe(IntLit(v), Shape(s)) => s.between(v, v)
    case GreaterThanOrEqual(Shape(s), IntLit(v)) => s.atLeast(v)
    case GreaterThan(Shape(s), IntLit(v)) => s.above(v)
    case LessThan(Shape(s), IntLit(v)) => s.below(v)
    case LessThanOrEqual(Shape(s), IntLit(v)) => s.atMost(v)
    // literal on the left: v OP f(x)  ≡  f(x) FLIP(OP) v
    case GreaterThanOrEqual(IntLit(v), Shape(s)) => s.atMost(v)
    case GreaterThan(IntLit(v), Shape(s)) => s.below(v)
    case LessThan(IntLit(v), Shape(s)) => s.above(v)
    case LessThanOrEqual(IntLit(v), Shape(s)) => s.atLeast(v)
    case In(Shape(s), vs) if vs.nonEmpty && vs.forall(IntLit.unapply(_).isDefined) =>
      val longs = vs.map(IntLit.unapply(_).get)
      s.between(longs.min, longs.max)
    case _ => None
  }
}

object CivilPredicateUnwrap {

  /** Non-null literal whose value space is a monotone Long: integrals,
    * DATE (epoch days, for toDate/toStartOf* comparisons) and TIMESTAMP
    * (epoch micros, for date_trunc comparisons). Type coercion guarantees
    * the literal's type already matches the shape's output type.
    */
  private object IntLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(null, _) => None
      case Literal(v: Byte, ByteType) => Some(v.toLong)
      case Literal(v: Short, ShortType) => Some(v.toLong)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, DateType) => Some(v.toLong)
      case Literal(v: Long, TimestampType | TimestampNTZType) => Some(v)
      case _ => None
    }
  }

  /** How bound literals are minted for the raw column: epoch-day input →
    * literal of the column's own type.
    */
  private sealed trait ColKind {
    def boundLit(epochDay: Long): Option[Literal]
  }
  private case object DateCol extends ColKind {
    def boundLit(epochDay: Long): Option[Literal] =
      if (epochDay < Int.MinValue || epochDay > Int.MaxValue) None
      else Some(Literal(epochDay.toInt, DateType))
  }
  /** Fixed-offset timestamp column: civil day d spans micros
    * [(d*86400-off)e6, ((d+1)*86400-off)e6). ±100M days keeps the micros
    * product far from Long overflow and beyond Spark's own ts range.
    */
  private case class TsCol(offsetSeconds: Long, t: DataType) extends ColKind {
    def boundLit(epochDay: Long): Option[Literal] =
      if (math.abs(epochDay) > 100000000L) None
      else Some(Literal((epochDay * 86400L - offsetSeconds) * 1000000L, t))
  }

  /** A monotone non-decreasing shape f over one column: `loLit(v)` is the
    * smallest column value whose image is ≥ v, as a literal of the
    * column's type — None when v is outside the invertible domain (the
    * conjunct is then simply not derived). Because f is integer-valued,
    * `loLit(v+1)` is the exclusive upper boundary for image ≤ v.
    */
  private sealed abstract class CivilShape(col: Expression) {
    protected def loLit(v: Long): Option[Literal]

    private def ge(v: Long): Option[Expression] =
      loLit(v).map(GreaterThanOrEqual(col, _))
    private def ltBoundary(v: Long): Option[Expression] =
      loLit(v).map(LessThan(col, _))

    def atLeast(v: Long): Option[Expression] = ge(v)             // f(x) >= v
    def above(v: Long): Option[Expression] = ge(v + 1)           // f(x) >  v
    def below(v: Long): Option[Expression] = ltBoundary(v)       // f(x) <  v
    def atMost(v: Long): Option[Expression] = ltBoundary(v + 1)  // f(x) <= v
    def between(lo: Long, hi: Long): Option[Expression] =
      (atLeast(lo), atMost(hi)) match {
        case (Some(l), Some(h)) => Some(And(l, h))
        case (l, h) => l.orElse(h)
      }
  }

  /** Shapes whose inverse lives naturally in epoch days. */
  private sealed abstract class DayShapeBase(col: Expression, kind: ColKind)
      extends CivilShape(col) {
    protected def loDay(v: Long): Option[Long]
    protected final def loLit(v: Long): Option[Literal] =
      loDay(v).flatMap(kind.boundLit)
  }

  private def yearOk(y: Long): Boolean = y >= 1 && y <= 9999

  private final class YearShape(col: Expression, kind: ColKind)
      extends DayShapeBase(col, kind) {
    protected def loDay(v: Long): Option[Long] =
      if (!yearOk(v)) None
      else Some(LocalDate.of(v.toInt, 1, 1).toEpochDay)
  }

  private final class YyyymmShape(col: Expression, kind: ColKind)
      extends DayShapeBase(col, kind) {
    protected def loDay(v: Long): Option[Long] = {
      val y = Math.floorDiv(v, 100L); val m = Math.floorMod(v, 100L)
      if (!yearOk(y)) None
      else if (m > 12L) Some(LocalDate.of(y.toInt + 1, 1, 1).toEpochDay)
      else Some(LocalDate.of(y.toInt, math.max(m, 1L).toInt, 1).toEpochDay)
    }
  }

  private final class YyyymmddShape(col: Expression, kind: ColKind)
      extends DayShapeBase(col, kind) {
    protected def loDay(v: Long): Option[Long] = {
      val y = Math.floorDiv(v, 10000L)
      val m = Math.floorMod(Math.floorDiv(v, 100L), 100L)
      val d = Math.floorMod(v, 100L)
      if (!yearOk(y)) None
      else if (m > 12L) Some(LocalDate.of(y.toInt + 1, 1, 1).toEpochDay)
      else {
        val first = LocalDate.of(y.toInt, math.max(m, 1L).toInt, 1)
        if (d <= 1L) Some(first.toEpochDay)
        else if (d > first.lengthOfMonth()) Some(first.plusMonths(1).toEpochDay)
        else Some(first.withDayOfMonth(d.toInt).toEpochDay)
      }
    }
  }

  /** Identity on epoch days: `cast(ts AS date)` compared to a DATE literal. */
  private final class DayShape(col: Expression, kind: ColKind)
      extends DayShapeBase(col, kind) {
    protected def loDay(v: Long): Option[Long] = Some(v)
  }

  /** `trunc(x, unit)` (toStartOfYear/Quarter/Month/Week): floor-to-boundary
    * compared to a DATE literal. Smallest day whose floor is ≥ v is the
    * unit-ceiling of v.
    */
  private final class TruncDateShape(col: Expression, kind: ColKind,
                                     unit: String)
      extends DayShapeBase(col, kind) {
    protected def loDay(v: Long): Option[Long] = {
      if (math.abs(v) > 100000000L) return None
      val d = LocalDate.ofEpochDay(v)
      val ceil = unit match {
        case "year" | "yyyy" | "yy" =>
          if (d.getDayOfYear == 1) d else LocalDate.of(d.getYear + 1, 1, 1)
        case "quarter" =>
          val qs = LocalDate.of(d.getYear, ((d.getMonthValue - 1) / 3) * 3 + 1, 1)
          if (d == qs) d else qs.plusMonths(3)
        case "month" | "mon" | "mm" =>
          if (d.getDayOfMonth == 1) d else d.withDayOfMonth(1).plusMonths(1)
        case "week" => // Spark trunc 'week' floors to Monday
          val dow = d.getDayOfWeek.getValue // Mon=1..Sun=7
          if (dow == 1) d else d.plusDays(8L - dow)
        case _ => return None
      }
      Some(ceil.toEpochDay)
    }
  }

  /** `date_trunc(unit, ts)` (toStartOfDay/Hour/Minute/Second): fixed-size
    * LOCAL buckets over micros under a fixed offset; compared to a
    * TIMESTAMP literal. Inverse computed directly in micros.
    */
  private final class TruncTsShape(col: Expression, offsetSeconds: Long,
                                   t: DataType, unitMicros: Long)
      extends CivilShape(col) {
    protected def loLit(v: Long): Option[Literal] = {
      // guard the +offset shift against overflow at the extremes
      if (math.abs(v) > Long.MaxValue / 2) return None
      val local = v + offsetSeconds * 1000000L
      val r = Math.floorMod(local, unitMicros)
      Some(Literal(if (r == 0L) v else v + (unitMicros - r), t))
    }
  }

  // ---- shape extractors --------------------------------------------------

  /** year/month/day-of(col): the Catalyst field over a DateType column, or
    * the EpochCivilField form CivilFieldRewrite plants for fixed-zone
    * timestamps. An integer-widening Cast around the field (added when
    * compared to a Long literal) is transparent — widening preserves order
    * and value.
    */
  private object FieldOf {
    def unapply(e: Expression): Option[(String, Expression, ColKind)] = e match {
      case Cast(inner, LongType | IntegerType, _, _) => unapply(inner)
      case Year(c) if c.dataType == DateType => Some(("year", c, DateCol))
      case Month(c) if c.dataType == DateType => Some(("month", c, DateCol))
      case DayOfMonth(c) if c.dataType == DateType => Some(("day", c, DateCol))
      case EpochCivilField(c, f, off) => Some((f, c, TsCol(off, c.dataType)))
      case _ => None
    }
  }

  /** A date-valued operand: a DateType expression (DateCol bounds) or a
    * fixed-zone `cast(ts AS date)` (bounds on the raw ts in micros).
    */
  private object DateOperand {
    def unapply(e: Expression): Option[(Expression, ColKind)] = e match {
      case c @ Cast(ts, DateType, _, _) if ts.dataType == TimestampType =>
        fixedOffsetSeconds(c.timeZoneId)
          .map(off => (ts, TsCol(off, TimestampType)))
      case Cast(ts, DateType, _, _) if ts.dataType == TimestampNTZType =>
        Some((ts, TsCol(0L, TimestampNTZType)))
      case d if d.dataType == DateType => Some((d, DateCol))
      case _ => None
    }
  }

  private val truncTsUnits: Map[String, Long] = Map(
    "day" -> 86400000000L, "dd" -> 86400000000L,
    "hour" -> 3600000000L, "minute" -> 60000000L, "second" -> 1000000L)

  private object Shape {
    // a non-deterministic operand (e.g. toYear(date_add(d, rand()))) would
    // be re-evaluated independently inside the derived range conjunct,
    // filtering rows the original predicate keeps — never derive from it
    def unapply(e: Expression): Option[CivilShape] =
      if (!e.deterministic) None else e match {
      case Cast(inner, LongType | IntegerType, _, _) => unapply(inner)
      case FieldOf("year", c, k) => Some(new YearShape(c, k))
      // toYYYYMM: year*100 + month, both over the same column
      case Add(Multiply(FieldOf("year", c1, k1), IntLit(100L), _),
          FieldOf("month", c2, k2), _)
          if c1.semanticEquals(c2) && k1 == k2 =>
        Some(new YyyymmShape(c1, k1))
      // toYYYYMMDD: year*10000 + month*100 + day, all over the same column
      case Add(Add(Multiply(FieldOf("year", c1, k1), IntLit(10000L), _),
          Multiply(FieldOf("month", c2, k2), IntLit(100L), _), _),
          FieldOf("day", c3, k3), _)
          if c1.semanticEquals(c2) && c1.semanticEquals(c3) &&
            k1 == k2 && k1 == k3 =>
        Some(new YyyymmddShape(c1, k1))
      // toStartOfYear/Quarter/Month/Week: trunc(date-or-fixed-zone-cast)
      case TruncDate(DateOperand(c, k), Literal(u: UTF8String, StringType)) =>
        Some(new TruncDateShape(c, k, u.toString.toLowerCase(java.util.Locale.ROOT)))
      // toStartOfDay/Hour/Minute: date_trunc over a fixed-zone timestamp
      case td @ TruncTimestamp(Literal(u: UTF8String, StringType), ts, _)
          if ts.dataType == TimestampType || ts.dataType == TimestampNTZType =>
        val unit = u.toString.toLowerCase(java.util.Locale.ROOT)
        val off = ts.dataType match {
          case TimestampNTZType => Some(0L)
          case _ => fixedOffsetSeconds(td.timeZoneId)
        }
        for {
          um <- truncTsUnits.get(unit)
          o <- off
        } yield new TruncTsShape(ts, o, ts.dataType, um)
      // toDate(ts) under a fixed-offset zone (NTZ ignores the zone)
      case c @ Cast(_, DateType, _, _) => DateOperand.unapply(c).collect {
        case (ts, k: TsCol) => new DayShape(ts, k)
      }
      case _ => None
    }
  }

  private def fixedOffsetSeconds(tzId: Option[String]): Option[Long] =
    tzId.flatMap { tz =>
      try {
        val rules =
          org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(tz).getRules
        if (rules.isFixedOffset)
          Some(rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds.toLong)
        else None
      } catch { case _: Exception => None }
    }
}
