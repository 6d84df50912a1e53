package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.RangeStreams

/** The native stream-stream interval join must reproduce the batch
  * inequality join exactly on a bounded replay (inner-join matches emit as
  * soon as both sides arrive; nothing waits on the watermark except state
  * eviction).
  */
class RangeStreamsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("fixture replay: stream-stream range join equals the batch join") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables(spark, SparkTestSession.sf, "events")
      .filter(col("event_type").isin("error", "click"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy(col("ts_us"))
      .as[(Long, Long, String, Double)].collect().toSeq
    val chunks = ev.grouped(math.max(1, ev.size / 3)).toSeq

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, Double)]
    val events = mem.toDF().toDF("event_id", "ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val q = RangeStreams.errorClickWindow(spark, events)
      .select("err_id", "click_id")
      .writeStream.format("memory").queryName("range_stream")
      .outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      val streaming = spark.table("range_stream")
      val base = Tables(spark, SparkTestSession.sf, "events")
      val batch = base.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
        .join(base.filter(col("event_type") === "click")
            .select(col("event_id").as("click_id"), col("ts").as("click_ts")),
          col("click_ts") >= col("err_ts") &&
            col("click_ts") < col("err_ts") + expr("INTERVAL 15 MINUTES"))
        .select("err_id", "click_id")
      assert(streaming.count() > 0)
      assert(streaming.exceptAll(batch).isEmpty &&
        batch.exceptAll(streaming).isEmpty)
    } finally q.stop()
  }
}
