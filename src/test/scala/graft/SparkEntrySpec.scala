package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = Sessions.build("graft-test")
  val sf: String = "/root/testdata/sf0.001"
}

class SparkEntrySpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query with an oracle has matching column names") {
    // The driver's compare sorts columns by name before hashing — a query
    // whose aliases drift from its oracle silently fails the gate. Catch
    // drift lexically: every Spark output column name must appear as an
    // identifier token in its oracle SQL (an unaliased oracle aggregate like
    // `sum(l_quantity)` never contains the Spark-side alias `sum_qty`).
    // Full value parity is the driver's DuckDB run (scripts/check_oracle.py).
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(SparkEntry.queries.contains(name), s"oracle without query: $name")
      val tokens = sql.toLowerCase.split("[^a-z0-9_]+").toSet
      val cols = SparkEntry.queries(name)(spark, sf).columns
      cols.foreach { c =>
        assert(tokens.contains(c.toLowerCase),
          s"$name: Spark column '$c' does not appear in oracle SQL — alias drift")
      }
    }
  }

  test("all queries execute at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }
}
