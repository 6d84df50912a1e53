package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata extracted by a per-partition decode
  * pass. The Spark-side shape is the real thing — typed Dataset,
  * mapPartitions batching, schema, and partition-preserving execution —
  * while the codec itself is STUBBED (no image/audio libraries in this
  * container): [[decodePartition]] derives deterministic fake dimensions
  * from the payload's first bytes where a real deployment would invoke
  * libjpeg/ffmpeg per partition.
  *
  * 100 TB design: decode is embarrassingly parallel map work; the binary
  * column stays columnar in parquet (no base64 inflation), partitions are
  * sized by `spark.sql.files.maxPartitionBytes` so a partition's payloads
  * fit executor memory, and the expensive codec is amortized per partition
  * (library init once per task, not per row).
  */
object MultimodalOps {

  /** A document's opaque binary payload. */
  final case class Blob(doc_id: Long, payload: Array[Byte])

  /** Typed metadata the decode pass extracts. */
  final case class MediaMeta(doc_id: Long, width: Int, height: Int, n_pixels: Int)

  /** STUB decode: real codec init + per-row decode would live here.
    * Deterministic fake: width/height from the first two payload bytes.
    */
  def decodePartition(it: Iterator[Blob]): Iterator[MediaMeta] = {
    // real impl: val codec = ImageCodec.open()  — once per partition
    it.map { b =>
      val w = b.payload(0) & 0xff
      val h = b.payload(1) & 0xff
      MediaMeta(b.doc_id, w, h, w * h)
    }
  }

  /** Full pipeline over `documents`: payload column (here a deterministic
    * md5-derived stand-in for real image bytes) → typed decode →
    * metadata DataFrame.
    */
  def decodeDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs.select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
      .as[Blob]
      .mapPartitions(decodePartition)
  }
}
