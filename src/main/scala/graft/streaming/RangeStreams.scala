package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the incremental twin of
  * `graft.operators.RangeJoin` (a02). Structured Streaming refuses a
  * stream-stream join without an equality predicate (state would be
  * unbounded-scan per row), so the batch operator's time-bin trick is not
  * just an optimization here — it is what MAKES the range join streamable:
  * exploding each interval to its covered fixed-width bins and bucketing
  * each point into one bin synthesizes the equi-key, and the residual
  * time-range condition between the two watermarked columns is exactly
  * what Spark uses to evict join state.
  *
  * State bounds: each side buffers only rows inside the watermark-derived
  * join window (the range condition tells Spark a click can only match
  * errors ≤ windowMinutes older, so both buffers are O(rows per horizon)).
  * Inner-join matches emit as soon as both rows have arrived — no maturity
  * wait (a match can never be superseded by later data, unlike as-of), so
  * a bounded replay yields exactly the batch join's rows.
  */
object RangeStreams {

  /** Clicks landing inside the `[err_ts, err_ts + windowMinutes)` window
    * after each error, over one interleaved watermarked event stream.
    * `binSeconds` is the synthesized equi-key width (≈ the window span).
    */
  def errorClickWindow(spark: SparkSession, events: DataFrame,
                       windowMinutes: Int = 15,
                       binSeconds: Long = 900L,
                       watermark: String = "30 minutes"): DataFrame = {
    // same guards as the batch twin (RangeJoin.pointInInterval): a zero
    // bin divides to Infinity -> null bins -> a silently empty join, and a
    // negative window makes sequence() descend through wrong bins
    require(binSeconds > 0, s"binSeconds must be > 0, got $binSeconds")
    require(windowMinutes > 0, s"windowMinutes must be > 0, got $windowMinutes")
    val binUs = binSeconds * 1000000L
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
      .withWatermark("err_ts", watermark)
      .withColumn("err_bin", explode(sequence(
        floor(unix_micros(col("err_ts")) / binUs),
        floor(unix_micros(col("err_ts") +
          expr(s"INTERVAL $windowMinutes MINUTES")) / binUs))))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
      .withColumn("click_bin", floor(unix_micros(col("click_ts")) / binUs))
    errors.join(clicks,
        col("err_bin") === col("click_bin") &&
          col("click_ts") >= col("err_ts") &&
          col("click_ts") < col("err_ts") +
            expr(s"INTERVAL $windowMinutes MINUTES"))
      .drop("err_bin", "click_bin")
  }
}
