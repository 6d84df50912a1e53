package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Allocation-free proleptic-Gregorian field extraction from epoch time.
  *
  * Spark's `year(cast(ts AS date))` path goes through
  * `DateTimeUtils.microsToDays` → `java.time` zone machinery per row
  * (~90 ns/row/core measured on the bench box). For a FIXED-offset zone the
  * whole conversion is integer arithmetic: epoch micros → local days is one
  * floor-division chain, and days → (year, month, day) is Howard Hinnant's
  * `civil_from_days` (public-domain algorithm,
  * howardhinnant.github.io/date_algorithms.html — the same algorithm
  * `java.time.LocalDate.ofEpochDay` implements), which the reference's
  * bundled DataFusion also uses for its `toYear` kernel
  * (crates/arrow/src/temporal_conversions.rs). Measured ~3-4× faster than
  * the `java.time` path on the 1.47B-row group-by anchor.
  *
  * Exactness: proleptic Gregorian over the full `Int` day range — matches
  * `LocalDate.ofEpochDay(days).get{Year,MonthValue,DayOfMonth}` bit-for-bit
  * (property-swept in CivilTimeSpec).
  */
object CivilTime {

  /** Epoch micros → local civil days under a fixed zone offset.
    * floorDiv twice == floorDiv once by the product, and going through
    * whole seconds first keeps `+ offsetSeconds` overflow-free for every
    * representable Spark timestamp (|seconds| ≤ 9.2e12, |offset| ≤ 18h).
    */
  def daysFromMicros(micros: Long, offsetSeconds: Long): Long =
    Math.floorDiv(Math.floorDiv(micros, 1000000L) + offsetSeconds, 86400L)

  def yearFromDays(days: Long): Int = {
    val z = days + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = z - era * 146097L
    val yoe = (doe - doe / 1460L + doe / 36524L - doe / 146096L) / 365L
    val doy = doe - (365L * yoe + yoe / 4L - yoe / 100L)
    val mp = (5L * doy + 2L) / 153L
    // civil month m = mp+3 (mp<10) | mp-9 (mp≥10); year bumps when m ≤ 2
    (yoe + era * 400L + (if (mp >= 10L) 1L else 0L)).toInt
  }

  def monthFromDays(days: Long): Int = {
    val z = days + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = z - era * 146097L
    val yoe = (doe - doe / 1460L + doe / 36524L - doe / 146096L) / 365L
    val doy = doe - (365L * yoe + yoe / 4L - yoe / 100L)
    val mp = (5L * doy + 2L) / 153L
    (if (mp < 10L) mp + 3L else mp - 9L).toInt
  }

  def dayFromDays(days: Long): Int = {
    val z = days + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = z - era * 146097L
    val yoe = (doe - doe / 1460L + doe / 36524L - doe / 146096L) / 365L
    val doy = doe - (365L * yoe + yoe / 4L - yoe / 100L)
    val mp = (5L * doy + 2L) / 153L
    (doy - (153L * mp + 2L) / 5L + 1L).toInt
  }

  def quarterFromDays(days: Long): Int = (monthFromDays(days) + 2) / 3

  // micros entry points — what the generated code calls (one static call,
  // JIT-inlined, keeps the whole-stage-codegen function body tiny)
  def yearFromMicros(micros: Long, off: Long): Int =
    yearFromDays(daysFromMicros(micros, off))
  def monthFromMicros(micros: Long, off: Long): Int =
    monthFromDays(daysFromMicros(micros, off))
  def dayFromMicros(micros: Long, off: Long): Int =
    dayFromDays(daysFromMicros(micros, off))
  def quarterFromMicros(micros: Long, off: Long): Int =
    quarterFromDays(daysFromMicros(micros, off))

  // Time-of-day fields: pure modular arithmetic once the offset is a
  // constant (local seconds-of-day = floorMod(epochSec + off, 86400)).
  def hourFromMicros(micros: Long, off: Long): Int =
    (Math.floorMod(Math.floorDiv(micros, 1000000L) + off, 86400L) / 3600L).toInt
  def minuteFromMicros(micros: Long, off: Long): Int =
    (Math.floorMod(Math.floorDiv(micros, 1000000L) + off, 3600L) / 60L).toInt
  def secondFromMicros(micros: Long, off: Long): Int =
    Math.floorMod(Math.floorDiv(micros, 1000000L) + off, 60L).toInt
}

/** `year/month/day/quarter(cast(<timestamp> AS date))` collapsed to integer
  * arithmetic for fixed-offset zones. Planted only by
  * [[graft.plans.CivilFieldRewrite]]; semantics identical to the expression
  * it replaces (see CivilTime scaladoc).
  *
  * @param field         one of "year" | "month" | "day" | "quarter"
  * @param offsetSeconds the zone's fixed UTC offset (0 for UTC/TimestampNTZ)
  */
case class EpochCivilField(child: Expression, field: String, offsetSeconds: Long)
    extends UnaryExpression {
  require(EpochCivilField.methods.contains(field), s"bad field: $field")

  override def dataType: DataType = IntegerType
  override def prettyName: String = s"epoch_$field"

  override def nullSafeEval(v: Any): Any = {
    val micros = v.asInstanceOf[Long]
    field match {
      case "year"    => CivilTime.yearFromMicros(micros, offsetSeconds)
      case "month"   => CivilTime.monthFromMicros(micros, offsetSeconds)
      case "day"     => CivilTime.dayFromMicros(micros, offsetSeconds)
      case "quarter" => CivilTime.quarterFromMicros(micros, offsetSeconds)
      case "hour"    => CivilTime.hourFromMicros(micros, offsetSeconds)
      case "minute"  => CivilTime.minuteFromMicros(micros, offsetSeconds)
      case "second"  => CivilTime.secondFromMicros(micros, offsetSeconds)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CivilTime." +
        s"${EpochCivilField.methods(field)}($c, ${offsetSeconds}L);")

  override protected def withNewChildInternal(c: Expression): EpochCivilField =
    copy(child = c)
}

object EpochCivilField {
  val methods: Map[String, String] = Map(
    "year" -> "yearFromMicros",
    "month" -> "monthFromMicros",
    "day" -> "dayFromMicros",
    "quarter" -> "quarterFromMicros",
    "hour" -> "hourFromMicros",
    "minute" -> "minuteFromMicros",
    "second" -> "secondFromMicros")
}
