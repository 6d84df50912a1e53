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
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every test table as a temp view (for spark.sql-based entries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n => apply(spark, dir, n).createOrReplaceTempView(n) }
}
