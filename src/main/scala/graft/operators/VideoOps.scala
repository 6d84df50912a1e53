package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video-column plumbing: the frame-sampling step of a multimodal training
  * pipeline (decode every k-th frame of each clip, not the whole stream).
  * Payloads are REAL containers — a length-indexed sequence of PNG frames
  * (`GVF0` magic · frame count · per-frame [byte-length | PNG bytes]) —
  * so the sampler exercises what matters at scale:
  *
  *   - SKIPPED frames are never decoded: the index lets the reader hop
  *     over them by length (the same reason real pipelines sample on
  *     keyframe/atom indexes instead of decoding the stream);
  *   - sampled frames go through a full `ImageIO` pixel decode, and the
  *     extracted feature (the frame-id stamped into pixel (0,0)) can only
  *     come out of the decoded pixels — the round-trip can't be faked;
  *   - codec state amortizes per partition via `mapPartitions`, payloads
  *     stay an opaque binary column (no base64 inflation), and partition
  *     sizing is `spark.sql.files.maxPartitionBytes`'s job, exactly as in
  *     [[MultimodalOps]] (reference analog: the file_format readers it
  *     bundles but never wires, e.g.
  *     crates/datafusion/src/physical_plan/file_format/avro.rs).
  *
  * Clip geometry (frame count, dimensions) derives from the document's
  * content hash, so the DuckDB oracle recomputes every aggregate in closed
  * form while Spark actually renders, frames, and re-decodes containers.
  */
object VideoOps {

  final case class Clip(doc_id: Long, payload: Array[Byte])
  final case class ClipSample(doc_id: Long, n_frames: Int, n_sampled: Int,
                              width: Int, height: Int, n_pixels_sampled: Long,
                              sum_frame_ids: Long)

  ImageIO.setUseCache(false) // memory-backed streams, not temp files

  private val Magic = 0x47564630 // "GVF0"

  /** Render (doc_id, nFrames, w, h) as a real container. Frame j's pixel
    * (0,0) carries j so the sampler's feature must come from pixel data.
    */
  def encodePartition(it: Iterator[(Long, Int, Int, Int)]): Iterator[Clip] = {
    if (!it.hasNext) return Iterator.empty
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    it.map { case (id, nFrames, w, h) =>
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(Magic)
      out.writeInt(nFrames)
      var j = 0
      while (j < nFrames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        img.setRGB(0, 0, j)
        val fb = new ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(fb)
        writer.setOutput(ios)
        writer.write(img)
        ios.close()
        val bytes = fb.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
        j += 1
      }
      Clip(id, bos.toByteArray)
    }
  }

  /** Decode every `stride`-th frame; hop over the rest by length without
    * touching their bytes.
    */
  def samplePartition(stride: Int)(it: Iterator[Clip]): Iterator[ClipSample] = {
    if (!it.hasNext) return Iterator.empty
    val reader = ImageIO.getImageReadersByFormatName("png").next()
    it.map { c =>
      val in = new DataInputStream(new ByteArrayInputStream(c.payload))
      require(in.readInt() == Magic, s"bad container magic for doc ${c.doc_id}")
      val nFrames = in.readInt()
      var j = 0
      var nSampled = 0
      var sumIds = 0L
      var w = 0
      var h = 0
      while (j < nFrames) {
        val len = in.readInt()
        if (j % stride == 0) {
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new ByteArrayInputStream(bytes))
          reader.setInput(iis, true, true)
          val img = reader.read(0)
          require(img != null, s"undecodable frame $j for doc ${c.doc_id}")
          iis.close()
          w = img.getWidth; h = img.getHeight
          sumIds += (img.getRGB(0, 0) & 0xffffff)
          nSampled += 1
        } else {
          in.skipNBytes(len.toLong) // the point of frame sampling: no decode
        }
        j += 1
      }
      ClipSample(c.doc_id, nFrames, nSampled, w, h,
        nSampled.toLong * w * h, sumIds)
    }
  }

  private def nib(pos: Int) =
    expr(s"instr('0123456789abcdef', substr(md5(text), $pos, 1)) - 1")

  /** Full pipeline over `documents`: hash-derived clip geometry → real
    * framed-PNG containers → binary column → per-partition stride-sampled
    * decode → typed features.
    */
  def sampleDocuments(spark: SparkSession, docs: DataFrame,
                      stride: Int = 3): Dataset[ClipSample] = {
    import spark.implicits._
    // Layout-conditional spread BEFORE the codec map work: the synthetic
    // corpus is one unsplittable parquet row group — without the exchange
    // the whole encode+sample pipeline fuses into a single task; a
    // well-split production scan gets NO exchange (see MultimodalOps)
    graft.Tables.maybeSpread(
        docs.select(col("doc_id"),
          ((nib(1) * lit(16) + nib(2)) % lit(10) + lit(3)).cast("int").as("nf"),
          (nib(3) % lit(8) + lit(2)).cast("int").as("w"),
          (nib(4) % lit(8) + lit(2)).cast("int").as("h")))
      .as[(Long, Int, Int, Int)]
      .mapPartitions(encodePartition)
      .mapPartitions(samplePartition(stride))
  }
}
