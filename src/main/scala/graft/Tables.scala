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
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
  }

  /** Register every test table as a temp view (for spark.sql-based entries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n => apply(spark, dir, n).createOrReplaceTempView(n) }
}
