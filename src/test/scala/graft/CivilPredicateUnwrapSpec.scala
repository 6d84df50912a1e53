package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** CivilPredicateUnwrap contract: predicates on monotone civil functions
  * (toYear/toYYYYMM/toYYYYMMDD/toDate) gain an implied raw-column range that
  * (a) never changes results, (b) reaches the parquet scan as a pushed
  * data filter, and (c) chains with PartitionPruneDerivation into hidden
  * __ptk directory pruning.
  */
class CivilPredicateUnwrapSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val g = {
    val s = spark.newSession()
    Tables.registerAll(s, "/root/testdata/sf0.001")
    val gs = new GraftSession(s)
    gs.sql("CREATE DATABASE IF NOT EXISTS unwrap_db")
    gs.sql("USE unwrap_db")
    gs
  }

  // sparkPlan, not executedPlan: AQE wraps the latter in an
  // AdaptiveSparkPlanExec with no children, hiding the scan from collect
  private def pushedOn(df: DataFrame, col: String): Boolean = {
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThan}
    scans.exists(_.dataFilters.exists { f =>
      f.references.exists(_.name == col) &&
        f.exists {
          case _: GreaterThanOrEqual | _: LessThan => true
          case _ => false
        }
    })
  }

  test("toYear(date) comparisons gain pushable ranges and keep results") {
    val forms = Seq(
      "toYear(l_shipdate) = 1996" ->
        "l_shipdate >= DATE'1996-01-01' AND l_shipdate < DATE'1997-01-01'",
      "toYear(l_shipdate) >= 2001" -> "l_shipdate >= DATE'2001-01-01'",
      "toYear(l_shipdate) > 2000" -> "l_shipdate >= DATE'2001-01-01'",
      "toYear(l_shipdate) < 1996" -> "l_shipdate < DATE'1996-01-01'",
      "toYear(l_shipdate) <= 1996" -> "l_shipdate < DATE'1997-01-01'",
      "1996 = toYear(l_shipdate)" ->
        "l_shipdate >= DATE'1996-01-01' AND l_shipdate < DATE'1997-01-01'",
      "toYear(l_shipdate) IN (1996, 1998)" ->
        "l_shipdate >= DATE'1996-01-01' AND l_shipdate < DATE'1999-01-01'",
      "toYear(l_shipdate) BETWEEN 1996 AND 1997" ->
        "l_shipdate >= DATE'1996-01-01' AND l_shipdate < DATE'1998-01-01'")
    forms.foreach { case (pred, range) =>
      val df = g.sql(s"SELECT count(*) AS n, CAST(sum(l_orderkey) AS BIGINT)" +
        s" AS s FROM lineitem WHERE $pred")
      // the raw-column range must be in the plan (as a pushable filter)
      assert(pushedOn(df, "l_shipdate"), s"no pushed range for: $pred")
      // and results must be EXACTLY the no-rule answer: re-ask with the
      // predicate Spark can already push, plus the original — same rows
      val oracle = g.sql("SELECT count(*) AS n, CAST(sum(l_orderkey) AS " +
        s"BIGINT) AS s FROM lineitem WHERE ($pred) AND ($range)")
      assert(df.collect().toSeq === oracle.collect().toSeq, s"for: $pred")
      // sanity: the predicate actually selects something for = / IN forms
      if (pred.contains("= 1996") || pred.contains("IN"))
        assert(df.collect()(0).getLong(0) > 0, s"vacuous test: $pred")
    }
  }

  test("toYYYYMM / toYYYYMMDD / toDate unwrap, including over timestamps") {
    // date column, yyyymm
    val ymDf = g.sql("SELECT count(*) AS n FROM lineitem " +
      "WHERE toYYYYMM(l_shipdate) = 199604")
    assert(pushedOn(ymDf, "l_shipdate"))
    val ymWant = g.sql("SELECT count(*) AS n FROM lineitem WHERE " +
      "l_shipdate >= DATE'1996-04-01' AND l_shipdate < DATE'1996-05-01'")
    assert(ymDf.collect().toSeq === ymWant.collect().toSeq)
    assert(ymDf.collect()(0).getLong(0) > 0)

    // yyyymmdd boundary: day beyond month length clamps to next month
    val ymd = g.sql("SELECT count(*) AS n FROM lineitem " +
      "WHERE toYYYYMMDD(l_shipdate) <= 19960430")
    val ymdWant = g.sql("SELECT count(*) AS n FROM lineitem " +
      "WHERE l_shipdate <= DATE'1996-04-30'")
    assert(ymd.collect().toSeq === ymdWant.collect().toSeq)
    assert(pushedOn(ymd, "l_shipdate"))

    // timestamp column (events.ts is TIMESTAMP_NTZ in the fixture):
    // toYear goes through EpochCivilField, toDate through the NTZ cast
    val tsY = g.sql("SELECT count(*) AS n FROM events WHERE toYear(ts) = 2024")
    assert(pushedOn(tsY, "ts"), "no pushed ts range for toYear(ts)")
    assert(tsY.collect()(0).getLong(0) > 0)
    val all = g.sql("SELECT count(*) AS n FROM events").collect()(0).getLong(0)
    assert(tsY.collect()(0).getLong(0) === all) // fixture is all-2024

    val tsD = g.sql("SELECT count(*) AS n FROM events " +
      "WHERE toDate(ts) = DATE'2024-01-03'")
    assert(pushedOn(tsD, "ts"), "no pushed ts range for toDate(ts)")
    val tsDWant = g.sql("SELECT count(*) AS n FROM events " +
      "WHERE ts >= TIMESTAMP_NTZ'2024-01-03 00:00:00' AND " +
      "ts < TIMESTAMP_NTZ'2024-01-04 00:00:00'")
    assert(tsD.collect().toSeq === tsDWant.collect().toSeq)
  }

  test("toStartOf* (trunc) shapes unwrap: month/quarter/week over dates, " +
    "day over timestamps") {
    // equality on an ALIGNED boundary
    val mEq = g.sql("SELECT count(*) AS n FROM lineitem " +
      "WHERE toStartOfMonth(l_shipdate) = DATE'1996-04-01'")
    assert(pushedOn(mEq, "l_shipdate"))
    val mWant = g.sql("SELECT count(*) AS n FROM lineitem WHERE " +
      "l_shipdate >= DATE'1996-04-01' AND l_shipdate < DATE'1996-05-01'")
    assert(mEq.collect().toSeq === mWant.collect().toSeq)
    assert(mEq.collect()(0).getLong(0) > 0)

    // range with an UNALIGNED literal: ceil must go to the next boundary
    val mGe = g.sql("SELECT count(*) AS n FROM lineitem " +
      "WHERE toStartOfMonth(l_shipdate) >= DATE'1996-04-15'")
    val mGeWant = g.sql("SELECT count(*) AS n FROM lineitem " +
      "WHERE l_shipdate >= DATE'1996-05-01'")
    assert(mGe.collect().toSeq === mGeWant.collect().toSeq)
    assert(pushedOn(mGe, "l_shipdate"))

    val qLt = g.sql("SELECT count(*) AS n FROM lineitem " +
      "WHERE toStartOfQuarter(l_shipdate) < DATE'1997-01-01'")
    val qWant = g.sql("SELECT count(*) AS n FROM lineitem " +
      "WHERE l_shipdate < DATE'1997-01-01'")
    assert(qLt.collect().toSeq === qWant.collect().toSeq)

    // 1996-04-01 is a Monday: week-equality covers exactly that week
    // (toMonday is the pure trunc-week; toStartOfWeek's CH default mode 0
    // is Sunday-start and compiles to a composite no shape matches)
    val wEq = g.sql("SELECT count(*) AS n FROM lineitem " +
      "WHERE toMonday(l_shipdate) = DATE'1996-04-01'")
    val wWant = g.sql("SELECT count(*) AS n FROM lineitem WHERE " +
      "l_shipdate >= DATE'1996-04-01' AND l_shipdate < DATE'1996-04-08'")
    assert(wEq.collect().toSeq === wWant.collect().toSeq)

    // date_trunc over the NTZ events timestamp: pushable micros bounds
    val dEq = g.sql("SELECT count(*) AS n FROM events " +
      "WHERE toStartOfDay(ts) = TIMESTAMP_NTZ'2024-01-03 00:00:00'")
    val dWant = g.sql("SELECT count(*) AS n FROM events WHERE " +
      "ts >= TIMESTAMP_NTZ'2024-01-03 00:00:00' AND " +
      "ts < TIMESTAMP_NTZ'2024-01-04 00:00:00'")
    assert(dEq.collect().toSeq === dWant.collect().toSeq)
    assert(dEq.collect()(0).getLong(0) > 0)

    val hGe = g.sql("SELECT count(*) AS n FROM events " +
      "WHERE toStartOfHour(ts) >= TIMESTAMP_NTZ'2024-01-03 07:30:00'")
    val hWant = g.sql("SELECT count(*) AS n FROM events " +
      "WHERE ts >= TIMESTAMP_NTZ'2024-01-03 08:00:00'")
    assert(hGe.collect().toSeq === hWant.collect().toSeq)
  }

  test("chains with PartitionPruneDerivation: toYear filter prunes " +
    "toYYYYMM-partitioned directories") {
    g.sql("DROP TABLE IF EXISTS unwrap_prune")
    g.sql("CREATE TABLE unwrap_prune(id Int64, d Date) PARTITION BY toYYYYMM(d)")
    g.sql("INSERT INTO unwrap_prune VALUES (1, '2020-12-31'), " +
      "(2, '2021-03-15'), (3, '2021-11-01'), (4, '2022-01-01')")
    val df = g.sql("SELECT id FROM unwrap_prune WHERE toYear(d) = 2021")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "derived __ptk filter missing — unwrap did not chain into pruning")
    // 3, not 4: __ptk >= 202101 excludes 2020-12. The upper bound from the
    // strict `d < 2022-01-01` is the step-function-safe `__ptk <= 202201`,
    // so the 2022-01 directory is listed but its rows filter out — one
    // boundary month of over-read, never a correctness issue.
    assert(scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length === 3,
      "expected the 2020-12 directory to be pruned")
  }

  test("DST region zones are NOT unwrapped (instant→date is non-monotone)") {
    val s2 = spark.newSession()
    Tables.registerAll(s2, "/root/testdata/sf0.001")
    val prev = s2.conf.get("spark.sql.session.timeZone")
    try {
      s2.conf.set("spark.sql.session.timeZone", "America/New_York")
      val g2 = new GraftSession(s2)
      // orders.o_orderdate is DateType → date side still unwraps (zone-free)
      val dDf = g2.sql("SELECT count(*) FROM orders WHERE toYear(o_orderdate) = 1996")
      assert(pushedOn(dDf, "o_orderdate"))
      // a TIMESTAMP (with zone) cast under a DST zone must NOT derive:
      // build one via to_utc_timestamp-free cast so the zone applies
      // Year over a date-typed EXPRESSION still derives a (zone-free,
      // correct) bound on that expression — but under a DST zone no bound
      // may land on the raw instant column, where the inverse would need
      // the zone's transition table.
      val tsDf = g2.sql("SELECT count(*) FROM (SELECT CAST(ts AS TIMESTAMP) " +
        "AS lts FROM events) WHERE toYear(lts) = 2024")
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
        BinaryComparison}
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      val rawInstantBound = tsDf.queryExecution.optimizedPlan.exists {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.exists {
            case c: BinaryComparison => Seq(c.left, c.right).exists {
              case a: AttributeReference =>
                a.dataType == TimestampType || a.dataType == TimestampNTZType
              case _ => false
            }
            case _ => false
          }
        case _ => false
      }
      assert(!rawInstantBound,
        "DST zone must not produce a bound on the raw instant column")
      // and the value is still right
      assert(tsDf.collect()(0).getLong(0) > 0)
    } finally s2.conf.set("spark.sql.session.timeZone", prev)
  }
}
