package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin
import graft.streaming.AsofStreams

/** The streaming as-of enrich must agree with the batch operator on every
  * click it emits, emit exactly the matured prefix (clicks strictly below
  * the final watermark), and handle out-of-order arrival: a view that
  * arrives AFTER a click but with an earlier event time still wins.
  */
class AsofStreamsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def us(min: Long): Long = min * 60L * 1000 * 1000

  private def startQuery(mem: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, Double)],
                         name: String,
                         retainIdleUs: Long = Long.MaxValue) = {
    val events = mem.toDF().toDF("user_id", "ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    AsofStreams.asofEnrich(spark, events, retainIdleUs = retainIdleUs).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
  }

  test("maturity, out-of-order views, and no-match clicks") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, Double)]
    val q = startQuery(mem, "asof_stream")
    try {
      def emitted(): Seq[(Long, Long, Option[Long], Option[Double])] =
        spark.table("asof_stream").orderBy("user_id", "click_us").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq

      // batch 1: view@100, click@110 (u1), click@105 with no view (u2).
      // Watermark still at 0 — nothing matures, nothing is emitted.
      mem.addData((1L, us(100), "view", 1.5), (1L, us(110), "click", 0.0),
        (2L, us(105), "click", 0.0))
      q.processAllAvailable()
      assert(emitted() === Seq.empty)

      // batch 2: a LATE view@108 for u1 (arrives after the click@110 was
      // buffered — out-of-order), plus an event far ahead to advance the
      // watermark past everything (wm = 300 - 30 = 270).
      mem.addData((1L, us(108), "view", 9.9), (9L, us(300), "view", 0.0))
      q.processAllAvailable()
      // u1's click matched the late view@108 (not the older view@100);
      // u2's click emitted with no match.
      assert(emitted() === Seq(
        (1L, us(110), Some(us(108)), Some(9.9)),
        (2L, us(105), None, None)))

      // batch 3: a click@272 for u1, above the floor view kept in pruned
      // state; advance wm past it — the floor (view@108) still matches,
      // proving pruning kept exactly the dominating view.
      mem.addData((1L, us(272), "click", 0.0))
      q.processAllAvailable()
      mem.addData((9L, us(400), "view", 0.0))
      q.processAllAvailable()
      assert(emitted().count(_._1 == 1L) === 2)
      assert(emitted().filter(_._1 == 1L).last ===
        ((1L, us(272), Some(us(108)), Some(9.9))))
    } finally q.stop()
  }

  test("finite retainIdleUs drops an idle user's floor view") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, Double)]
    val q = startQuery(mem, "asof_stream_ret", retainIdleUs = us(10))
    try {
      // u1 views at t=100 then idles; wm advances to 170, far past the
      // 10-minute retention deadline (110) — the timeout removes u1's state.
      mem.addData((1L, us(100), "view", 5.0), (9L, us(200), "view", 0.0))
      q.processAllAvailable()
      // u1 clicks at 180 (≥ wm, accepted); mature it past wm=185.
      mem.addData((1L, us(180), "click", 0.0))
      q.processAllAvailable()
      mem.addData((9L, us(215), "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_stream_ret")
        .filter(col("user_id") === 1L).collect()
      assert(got.length === 1)
      // the view would have matched under exact (infinite) retention, but
      // the bounded policy traded the long-gap match for bounded state
      assert(got.head.isNullAt(2) && got.head.isNullAt(3))
    } finally q.stop()
  }

  test("fixture replay: emitted prefix equals the batch operator") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables(spark, SparkTestSession.sf, "events")
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy(col("ts_us"))
      .as[(Long, Long, String, Double)].collect().toSeq
    val chunks = ev.grouped(math.max(1, ev.size / 3)).toSeq

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, Double)]
    val q = startQuery(mem, "asof_stream_fix")
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      val finalWmUs = ev.map(_._2).max - 30L * 60 * 1000 * 1000

      val streaming = spark.table("asof_stream_fix")
        .select(col("user_id"), col("click_us"), col("view_us"), col("view_value"))
      val views = Tables(spark, SparkTestSession.sf, "events")
        .filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("view_value"))
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("view_us"),
          col("view_value"))
      val clicks = Tables(spark, SparkTestSession.sf, "events")
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("click_us"))
      val batch = AsofJoin.backward(clicks, views, "user_id", "ts", "ts",
          Seq("view_us", "view_value"))
        .filter(col("click_us") < finalWmUs)
        .select(col("user_id"), col("click_us"), col("view_us"), col("view_value"))

      assert(streaming.count() === batch.count())
      assert(streaming.exceptAll(batch).isEmpty &&
        batch.exceptAll(streaming).isEmpty)
    } finally q.stop()
  }
}
