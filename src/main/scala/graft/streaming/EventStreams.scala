package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table — beyond-reference surface
  * (the reference has no streaming machinery at all, SURVEY §2.9; its only
  * "streaming" is batch block ingestion). A training-data pipeline at
  * 100 TB ingests continuously, so the same event analytics ship here as
  * incremental queries: file-source stream → watermarked windowed
  * aggregation, and per-user sessionization via the arbitrary-state API.
  *
  * Scale posture: the file source lists+reads new files per micro-batch
  * (the 100 TB shape is the same code over a cloud bucket or Kafka);
  * windowed aggregation carries state only for open windows bounded by the
  * watermark; sessionization state is per-user and dropped when emitted.
  */
object EventStreams {

  /** events.parquet physical schema under nanosAsLong (ts arrives as raw
    * nanosecond longs; converted exactly like [[graft.Tables.events]]).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream of events from a directory of parquet files. */
  def readEvents(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(rawSchema).parquet(inputDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-hour windowed counts/sums per event type with a 1-hour
    * watermark bounding state.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 6))), 4)
          .cast("double").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  final case class SessionStats(user_id: Long, n_sessions: Int, n_events: Long)

  /** Per-user sessionization (30-minute inactivity gap) through the
    * arbitrary-stateful API. State carries only (last ts, counters) per
    * user between batches.
    */
  def sessionStats(spark: SparkSession, events: DataFrame): Dataset[SessionStats] = {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000 * 1000
    events.select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Int, Long), SessionStats](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[(Long, Int, Long)]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          var (lastTs, nSessions, nEvents) =
            state.getOption.getOrElse((Long.MinValue, 0, 0L))
          sorted.foreach { t =>
            if (lastTs == Long.MinValue || t - lastTs > gapUs) nSessions += 1
            nEvents += 1
            lastTs = t
          }
          state.update((lastTs, nSessions, nEvents))
          Iterator.single(SessionStats(uid, nSessions, nEvents))
      }
  }
}
