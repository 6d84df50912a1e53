package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession
import graft.server.ChProto
import graft.types.BqlType

/** DateTime64(p[, tz]) + Date32 (VERDICT r15 #7): parse/DESC/replay
  * round-trip, insert coercion (tick integers AND sub-second strings),
  * and the native-wire codec (i64 ticks / i32 days).
  */
class DateTime64Spec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  test("parse + chName round-trip") {
    assert(BqlType.parse("DateTime64").toOption.get.chName === "DateTime64(3)")
    assert(BqlType.parse("DateTime64(6)").toOption.get.chName ===
      "DateTime64(6)")
    assert(BqlType.parse("DateTime64(3, 'UTC')").toOption.get.chName ===
      "DateTime64(3, 'UTC')")
    assert(BqlType.parse("Date32").toOption.get.chName === "Date32")
    assert(BqlType.parse("DateTime64(10)").isLeft, "precision caps at 9")
    assert(BqlType.parse("Nullable(DateTime64(6))").isRight)
    // re-parse of the canonical form (the DESC/replay path)
    val rt = BqlType.parse("DateTime64(3, 'UTC')").toOption.get
    assert(BqlType.parse(rt.chName).toOption.get === rt)
  }

  test("insert coercion: tick integers at declared precision, sub-second " +
    "strings, pre-1970 Date32; DESC shows the declared types") {
    g.sql("DROP TABLE IF EXISTS dt64_t")
    g.sql("CREATE TABLE dt64_t(k Int64, t3 DateTime64(3), " +
      "t6 DateTime64(6), d Date32)")
    g.sql("INSERT INTO dt64_t VALUES " +
      "(1, 1704067200123, '2024-01-01 00:00:00.123456', '1965-03-02')")
    val r = g.sql("SELECT unix_micros(t3) AS a, unix_micros(t6) AS b, " +
      "CAST(d AS STRING) AS d FROM dt64_t").collect()(0)
    assert(r.getLong(0) === 1704067200123000L)
    assert(r.getLong(1) === 1704067200123456L)
    assert(r.getString(2) === "1965-03-02")
    val desc = g.sql("DESC dt64_t").collect()
      .map(x => (x.getString(0), x.getString(1))).toMap
    assert(desc("t3") === "DateTime64(3)")
    assert(desc("d") === "Date32")
    g.sql("DROP TABLE dt64_t")
  }

  test("toDateTime64 / toDate32 / now64 function forms") {
    val r = g.sql("SELECT " +
      "unix_micros(toDateTime64('2024-01-01 00:00:00.123456', 3)) AS a, " +
      "unix_micros(toDateTime64(1704067200.5, 6)) AS b, " +
      "CAST(toDate32(-1770) AS STRING) AS c, " +        // pre-1970 days
      "CAST(toDate32('1965-03-02') AS STRING) AS d, " +
      "now64() IS NOT NULL AS e, " +
      "unix_micros(now64(0)) % 1000000 AS f").collect()(0)
    assert(r.getLong(0) === 1704067200123000L, "p=3 truncates to ms ticks")
    assert(r.getLong(1) === 1704067200500000L, "fractional seconds keep µs")
    assert(r.getString(2) === "1965-02-26", "integer days NOT clamped at 0")
    assert(r.getString(3) === "1965-03-02")
    assert(r.getBoolean(4))
    assert(r.getLong(5) === 0L, "now64(0) truncates to whole seconds")
  }

  test("toStartOf{Second,FiveMinutes,Week} and toStartOfInterval floor " +
    "onto their grids") {
    val r = g.sql("SELECT " +
      "CAST(toStartOfFiveMinutes(toDateTime('2024-03-05 10:43:21')) AS STRING) AS a, " +
      "CAST(toStartOfFifteenMinutes(toDateTime('2024-03-05 10:43:21')) AS STRING) AS b, " +
      "CAST(toStartOfWeek(toDate('2024-03-05')) AS STRING) AS c, " +        // Tue -> Sunday 03-03
      "CAST(toStartOfWeek(toDate('2024-03-03')) AS STRING) AS c2, " +       // Sunday stays
      "CAST(toStartOfWeek(toDate('2024-03-05'), 1) AS STRING) AS d, " +     // mode 1 -> Monday
      "CAST(toStartOfInterval(toDateTime('2024-03-05 10:43:21'), " +
      "INTERVAL 10 MINUTE) AS STRING) AS e, " +
      "CAST(toStartOfInterval(toDate('2024-05-20'), INTERVAL 2 MONTH) " +
      "AS STRING) AS f, " +
      "CAST(toStartOfSecond(toDateTime64('2024-01-01 00:00:00.987654', 6)) " +
      "AS STRING) AS g").collect()(0)
    assert(r.getString(0) === "2024-03-05 10:40:00")
    assert(r.getString(1) === "2024-03-05 10:30:00")
    assert(r.getString(2) === "2024-03-03")
    assert(r.getString(3) === "2024-03-03")
    assert(r.getString(4) === "2024-03-04")
    assert(r.getString(5) === "2024-03-05 10:40:00")
    assert(r.getString(6) === "2024-05-01")
    assert(r.getString(7) === "2024-01-01 00:00:00")
  }

  test("native-wire codec round-trips DateTime64 ticks and Date32 days") {
    def roundTrip(t: BqlType, v: Any): Any = {
      val bos = new ByteArrayOutputStream()
      ChProto.writeScalar(bos, t, v)
      ChProto.readValue(new ByteArrayInputStream(bos.toByteArray), t)
    }
    val inst = java.time.Instant.parse("2024-01-01T00:00:00.123456Z")
    assert(roundTrip(BqlType.DateTime64(6, None), inst) === inst)
    // ms precision: the codec truncates to the declared tick
    val ms = java.time.Instant.parse("2024-01-01T00:00:00.123Z")
    assert(roundTrip(BqlType.DateTime64(3, None), ms) === ms)
    val d = java.time.LocalDate.of(1965, 3, 2)
    assert(roundTrip(BqlType.Date32, d) === d)
    assert(roundTrip(BqlType.Date32, java.time.LocalDate.of(2100, 1, 1)) ===
      java.time.LocalDate.of(2100, 1, 1))
  }
}
