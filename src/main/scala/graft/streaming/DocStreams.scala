package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document-pipeline operators — the incremental face of the
  * batch LLM-dedup surface (queries/LlmQueries.scala). The reference has
  * no streaming at all (SURVEY §2.9); a 100 TB training-data pipeline
  * ingests continuously, so exact dedup also ships as a streaming
  * operator with bounded state.
  */
object DocStreams {

  /** Streaming exact dedup (l01's hash-key dedup, incremental): keep the
    * first document per content hash, dropping re-observations that
    * arrive within the event-time watermark horizon. State is one entry
    * per distinct hash seen within the horizon and is evicted as the
    * watermark passes — bounded by ingest rate × horizon, not by corpus
    * size (a plain dropDuplicates would pin every hash ever seen).
    *
    * Input must carry an event-time `ts` column alongside `doc_id`/`text`.
    */
  def dedupedDocs(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("k", md5(lower(col("text"))))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("k")
      .drop("k")
}
