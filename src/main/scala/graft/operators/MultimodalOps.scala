package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata extracted by a per-partition decode
  * pass. Both sides are REAL here: payloads are actual PNG containers
  * (rendered per row via `javax.imageio`, in the JDK — no external codec
  * jar needed) and the decode pass parses them back with `ImageIO.read`,
  * yielding the true pixel dimensions.
  *
  * 100 TB design: encode/decode are embarrassingly parallel map work; the
  * binary column stays columnar in parquet (no base64 inflation),
  * partitions are sized by `spark.sql.files.maxPartitionBytes` so a
  * partition's payloads fit executor memory, and codec state is amortized
  * per partition via `mapPartitions` (one reader/writer setup per task,
  * not per row — the correct Spark shape for libjpeg/ffmpeg-class codecs).
  */
object MultimodalOps {

  /** A document's opaque binary payload. */
  final case class Blob(doc_id: Long, payload: Array[Byte])

  /** Typed metadata the decode pass extracts. */
  final case class MediaMeta(doc_id: Long, width: Int, height: Int, n_pixels: Int)

  // ImageIO defaults to a DISK-backed stream cache: every read/write
  // creates and deletes a temp file, which dominates per-row cost on a
  // slow filesystem. Memory-cache instead (process-wide, idempotent).
  ImageIO.setUseCache(false)

  /** Render each (doc_id, w, h) as a real PNG payload. Codec state (the
    * PNG ImageWriter) is acquired ONCE per partition and reused per row —
    * the amortization mapPartitions exists for; ImageIO.write would
    * re-run the SPI writer lookup on every call.
    */
  def encodePartition(it: Iterator[(Long, Int, Int)]): Iterator[Blob] = {
    if (!it.hasNext) return Iterator.empty
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    it.map { case (id, w, h) =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, (id & 0xffffff).toInt)
      val bos = new ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(img)
      ios.close()
      Blob(id, bos.toByteArray)
    }
  }

  /** Real decode: parse the PNG container, return actual dimensions. The
    * PNG ImageReader is likewise reused across the partition.
    */
  def decodePartition(it: Iterator[Blob]): Iterator[MediaMeta] = {
    if (!it.hasNext) return Iterator.empty
    val reader = ImageIO.getImageReadersByFormatName("png").next()
    it.map { b =>
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(b.payload))
      reader.setInput(iis, true, true)
      val img = reader.read(0) // full pixel decode, not just the header
      require(img != null, s"undecodable image payload for doc ${b.doc_id}")
      iis.close()
      MediaMeta(b.doc_id, img.getWidth, img.getHeight,
        img.getWidth * img.getHeight)
    }
  }

  /** Dimension a document deterministically from its content hash
    * (1..64 on each axis — small enough that the per-row PNG
    * deflate/inflate stays cheap at bench scale) — the stand-in for
    * "documents reference image assets"; the oracle recomputes the same
    * arithmetic.
    */
  private def dimExpr(firstNibble: Int) = {
    def nib(pos: Int) =
      expr(s"instr('0123456789abcdef', substr(md5(text), $pos, 1)) - 1")
    ((nib(firstNibble) * lit(16) + nib(firstNibble + 1)) % lit(64) + lit(1)).cast("int")
  }

  /** Full pipeline over `documents`: derive dimensions → render real PNG
    * payloads → binary column → per-partition `ImageIO` decode → typed
    * metadata.
    */
  def decodeDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    // Spread BEFORE the codec map work: the synthetic corpus is one
    // parquet row group, which Spark cannot split — without the exchange
    // the whole encode+decode pipeline fuses into a single task (measured
    // 1 partition, ~5x wall). Layout-conditional (Tables.maybeSpread):
    // a well-split production scan gets NO exchange — an unconditional
    // repartition would round-robin the whole binary corpus.
    graft.Tables.maybeSpread(
        docs.select(col("doc_id"), dimExpr(1).as("w"), dimExpr(3).as("h")))
      .as[(Long, Int, Int)]
      .mapPartitions(encodePartition)
      .mapPartitions(decodePartition)
  }

  // ---- m04: perceptual hashing over REAL pixels -----------------------

  /** A document image's 64-bit average-hash, pre-split into the four
    * 16-bit LSH bands ((63-idx) div 16 for sample index idx = j*8+i).
    */
  final case class ImgHash(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Render a deterministic gradient-with-cross-term pattern:
    * g(x,y) = (x·a + y·b + x·y·q + c) mod 251, drawn as gray RGB. The
    * (w,h,a,b,q) params derive from the content hash and c from doc_id,
    * so structurally similar documents render near-identical images —
    * the corpus the near-dup entry needs — and the oracle can recompute
    * every sampled luminance in closed form.
    */
  def encodePatternedPartition(
      it: Iterator[(Long, Int, Int, Int, Int, Int, Int)]): Iterator[Blob] = {
    if (!it.hasNext) return Iterator.empty
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    it.map { case (id, w, h, a, b, q, c) =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = (x * a + y * b + x * y * q + c) % 251
          img.setRGB(x, y, g * 0x010101)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(img)
      ios.close()
      Blob(id, bos.toByteArray)
    }
  }

  /** The average-hash (aHash) computed from DECODED pixels: sample an
    * 8×8 grid at (⌊i·w/8⌋, ⌊j·h/8⌋), set bit idx = j*8+i when the
    * sample's luminance·64 exceeds the grid total (integer-exact mean
    * comparison), pack bit idx at position 63-idx, emit the four 16-bit
    * bands. PNG is lossless, so the pixel-derived hash equals the
    * closed-form oracle bit for bit.
    */
  def hashPartition(it: Iterator[Blob]): Iterator[ImgHash] = {
    if (!it.hasNext) return Iterator.empty
    val reader = ImageIO.getImageReadersByFormatName("png").next()
    it.map { blob =>
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(blob.payload))
      reader.setInput(iis, true, true)
      val img = reader.read(0)
      iis.close()
      val w = img.getWidth
      val h = img.getHeight
      val lum = new Array[Int](64)
      var j = 0
      while (j < 8) {
        var i = 0
        while (i < 8) {
          lum(j * 8 + i) = img.getRGB(i * w / 8, j * h / 8) & 0xff
          i += 1
        }
        j += 1
      }
      val total = lum.sum
      val bands = new Array[Int](4)
      var idx = 0
      while (idx < 64) {
        if (lum(idx) * 64 > total) {
          val bp = 63 - idx
          bands(bp / 16) |= 1 << (bp % 16)
        }
        idx += 1
      }
      ImgHash(blob.doc_id, bands(0), bands(1), bands(2), bands(3))
    }
  }

  /** Full m04 pipeline: derive pattern params → render real PNGs →
    * per-partition decode → pixel-sampled aHash bands.
    */
  def imageHashes(spark: SparkSession, docs: DataFrame): Dataset[ImgHash] = {
    import spark.implicits._
    def nib(pos: Int) =
      expr(s"instr('0123456789abcdef', substr(md5(text), $pos, 1)) - 1")
    graft.Tables.maybeSpread(docs.select(
        col("doc_id"),
        (nib(1) % lit(8) + lit(32)).cast("int").as("w"),
        (nib(2) % lit(8) + lit(32)).cast("int").as("h"),
        (nib(3) + lit(1)).cast("int").as("a"),
        (nib(4) + lit(1)).cast("int").as("b"),
        (nib(5) % lit(4) + lit(1)).cast("int").as("q"),
        (col("doc_id") % lit(3)).cast("int").as("c")))
      .as[(Long, Int, Int, Int, Int, Int, Int)]
      .mapPartitions(encodePatternedPartition)
      .mapPartitions(hashPartition)
  }
}
