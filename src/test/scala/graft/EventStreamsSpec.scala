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

  test("windowed topK: streaming == batch (bounded SpaceSaving state)") {
    val q = EventStreams.windowedTopK(spark,
        EventStreams.readEvents(spark, inputDir))
      .writeStream.format("memory").queryName("win_topk")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streaming = spark.table("win_topk")
      .orderBy("win_start", "rank").collect()
    graft.functions.ChAggregates.register(spark)
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr("top_k_3(event_type)").as("tk"))
      .select(col("window.start").as("win_start"), posexplode(col("tk")))
      .select(col("win_start"), col("pos").cast("int").as("rank"),
        col("col._1").as("etype"), col("col._2").cast("long").as("cnt"))
      .orderBy("win_start", "rank").collect()
    assert(streaming.nonEmpty)
    assert(streaming.map(_.toString).toSeq === batch.map(_.toString).toSeq)
  }

  test("windowed funnel: streaming == batch (matched-events state only)") {
    val q = EventStreams.windowedFunnel(spark,
        EventStreams.readEvents(spark, inputDir))
      .writeStream.format("memory").queryName("win_funnel")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streaming = spark.table("win_funnel")
      .orderBy("win_start", "user_id").collect()
    graft.functions.BehaviorFunctions.register(spark)
    val batch = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy(window(col("ts"), "1 day"), col("user_id"))
      .agg(expr(
        """window_funnel_24h_3(unix_micros(ts),
          |  CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
          |                  WHEN 'purchase' THEN 3 ELSE 0 END)""".stripMargin)
        .as("lvl"))
      .select(col("window.start").as("win_start"), col("user_id"),
        col("lvl").cast("int").as("lvl"))
      .orderBy("win_start", "user_id").collect()
    assert(streaming.nonEmpty)
    assert(streaming.map(_.toString).toSeq === batch.map(_.toString).toSeq)
    // the funnel is non-trivial on this corpus: some user reaches depth 3
    assert(spark.table("win_funnel").filter(col("lvl") === 3).count() > 0)
  }

  test("sessionization: emit on close only, state dropped after the gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    def us(min: Long): Long = min * 60L * 1000 * 1000
    val events = mem.toDF().toDF("user_id", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

    val q = EventStreams.sessionize(spark, events).toDF()
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      def emitted(): Seq[(Long, Long, Long, Long)] =
        spark.table("sessions").orderBy("user_id", "start_us").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

      // batch 1: u1 has two events 10 min apart (one open session),
      // u2 one event — nothing closes, nothing is emitted.
      mem.addData((1L, us(600)), (1L, us(610)), (2L, us(600)))
      q.processAllAvailable()
      assert(emitted() === Seq.empty)

      // batch 2: u1 comes back 110 min later — past the gap, so u1's
      // first session closes INLINE and a new one opens. The watermark
      // advance (720 - 30 = 690) then fires u2's EventTimeTimeout
      // (deadline 600 + 30 = 630): its session is emitted and its state
      // removed (processAllAvailable drains the timeout batch too).
      mem.addData((1L, us(720)))
      q.processAllAvailable()
      assert(emitted() === Seq(
        (1L, us(600), us(610), 2L),
        (2L, us(600), us(600), 1L)))

      // batch 3: more data, further watermark advance — u2 must NOT be
      // re-emitted (state gone), u1's new session and u3's stay open.
      mem.addData((3L, us(721)))
      q.processAllAvailable()
      assert(emitted().count(_._1 == 2L) === 1)
      assert(emitted().count(_._1 == 3L) === 0)
    } finally q.stop()
  }

  test("e03 batch sessionization == streaming sessionize's closed sessions " +
    "on the same events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def us(min: Long): Long = min * 60L * 1000 * 1000
    // three users with multi-session histories; user 999's single far-
    // future event pushes the watermark past every other deadline so all
    // their sessions CLOSE; only 999's own session stays open
    val data = Seq(
      (1L, 600L), (1L, 610L), (1L, 700L), (1L, 715L), // 2 sessions (gap 90)
      (2L, 600L),                                     // 1 session
      (3L, 100L), (3L, 131L), (3L, 161L),             // 2 sessions: gap 31 breaks (>30 strict), gap 30 holds
      (999L, 5000L))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val events = mem.toDF().toDF("user_id", "ts_us")
      .withColumn("ts", timestamp_micros(expr("ts_us * 60000000"))).drop("ts_us")
    val q = EventStreams.sessionize(spark, events).toDF()
      .writeStream.format("memory").queryName("e03_sessions")
      .outputMode("append").start()
    val streamed =
      try {
        mem.addData(data)
        q.processAllAvailable()
        spark.table("e03_sessions").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
      } finally q.stop()
    assert(streamed.nonEmpty && !streamed.exists(_._1 == 999L))
    // batch rule over the SAME events (session level, before the census)
    data.zipWithIndex
      .map { case ((u, m), i) => (i.toLong, u, new java.sql.Timestamp(us(m) / 1000)) }
      .toDF("event_id", "user_id", "ts")
      .createOrReplaceTempView("events")
    val batch = spark.sql(
      """WITH x AS (
        |  SELECT user_id, event_id, unix_micros(ts) AS t,
        |    CASE WHEN lag(unix_micros(ts)) OVER (
        |        PARTITION BY user_id ORDER BY unix_micros(ts), event_id) IS NULL
        |      OR unix_micros(ts) - lag(unix_micros(ts)) OVER (
        |        PARTITION BY user_id ORDER BY unix_micros(ts), event_id) > 1800000000
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), s AS (
        |  SELECT user_id, t, sum(brk) OVER (
        |    PARTITION BY user_id ORDER BY t, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x
        |)
        |SELECT user_id, min(t) AS start_us, max(t) AS end_us,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // every closed streaming session must be a batch session, and batch
    // minus the open (999) session must be exactly the streamed set
    assert(batch.filterNot(_._1 == 999L) == streamed,
      s"batch=$batch\nstreamed=$streamed")
  }
}
