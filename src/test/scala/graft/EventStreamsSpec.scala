package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming results must equal their batch equivalents over the same
  * input — the incremental plan is an optimization, not a semantic change.
  */
class EventStreamsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private lazy val inputDir: String = {
    val dir = Files.createTempDirectory("graft-stream-in")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("windowed counts: streaming == batch") {
    val q = EventStreams.windowedCounts(EventStreams.readEvents(spark, inputDir))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streaming = spark.table("win_counts")
      .orderBy("win_start", "event_type").collect()
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")), 4)
          .cast("double").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy("win_start", "event_type").collect()
    assert(streaming.length === batch.length)
    assert(streaming.map(_.toString).toSeq === batch.map(_.toString).toSeq)
  }

  test("sessionization: streaming state == batch lag-based sessions") {
    val q = EventStreams.sessionStats(spark,
        EventStreams.readEvents(spark, inputDir))
      .toDF()
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streaming = spark.table("sessions")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    // batch oracle: session starts where the gap to the previous event of
    // the same user exceeds 30 minutes
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev", lag(col("ts_us"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us")))
      .withColumn("new_session",
        when(col("prev").isNull || col("ts_us") - col("prev") > 30L * 60 * 1000 * 1000, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(sum("new_session").cast("int").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    assert(streaming.toSeq === batch.toSeq)
  }
}
