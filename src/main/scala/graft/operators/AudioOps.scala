package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio-modality plumbing, the second real codec next to
  * [[MultimodalOps]]'s PNG path: payloads are genuine WAV containers
  * (44-byte RIFF header + 16-bit LE mono PCM — written and parsed with
  * plain JVM code, no codec jar), and the feature pass re-reads the
  * container to extract frame-level stats (peak, zero-crossing count,
  * energy).
  *
  * The synthesized signal is a square wave built from INTEGER arithmetic
  * only, so every extracted feature is integer-exact and the DuckDB oracle
  * can recompute it from the same closed-form definition — no float DSP
  * whose libm could differ by an ulp across engines.
  *
  * 100 TB design: synth/parse are embarrassingly parallel map stages with
  * per-partition state (mapPartitions), payloads stay an opaque binary
  * column, and features aggregate map-side — the same shape as m01.
  */
object AudioOps {

  final case class AudioBlob(doc_id: Long, payload: Array[Byte])
  final case class AudioMeta(doc_id: Long, n_samples: Int, peak: Int,
                             zero_crossings: Int, energy: Long)

  val SampleRate = 8000

  private def putIntLe(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  private def putShortLe(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }
  private def getIntLe(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getShortLe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort.toInt

  /** Render (doc_id, n_samples, period, amplitude) as a complete WAV file:
    * square wave s[i] = +amp while (i mod period) is in the first half of
    * the period, else -amp.
    */
  def synthPartition(it: Iterator[(Long, Int, Int, Int)]): Iterator[AudioBlob] =
    it.map { case (id, n, period, amp) =>
      val b = new Array[Byte](44 + n * 2)
      "RIFF".getBytes.copyToArray(b, 0); putIntLe(b, 4, 36 + n * 2)
      "WAVE".getBytes.copyToArray(b, 8); "fmt ".getBytes.copyToArray(b, 12)
      putIntLe(b, 16, 16) // fmt chunk size
      putShortLe(b, 20, 1) // PCM
      putShortLe(b, 22, 1) // mono
      putIntLe(b, 24, SampleRate)
      putIntLe(b, 28, SampleRate * 2) // byte rate
      putShortLe(b, 32, 2) // block align
      putShortLe(b, 34, 16) // bits per sample
      "data".getBytes.copyToArray(b, 36); putIntLe(b, 40, n * 2)
      var i = 0
      while (i < n) {
        putShortLe(b, 44 + i * 2, if ((i % period) * 2 < period) amp else -amp)
        i += 1
      }
      AudioBlob(id, b)
    }

  /** Parse the WAV container back and extract features from the decoded
    * PCM: sample count (from the data chunk), peak |amplitude|, strict
    * sign-change zero crossings, and total energy (sum of squares).
    */
  def featuresPartition(it: Iterator[AudioBlob]): Iterator[AudioMeta] =
    it.map { blob =>
      val b = blob.payload
      require(new String(b, 0, 4) == "RIFF" && new String(b, 8, 4) == "WAVE",
        s"not a RIFF/WAVE payload for doc ${blob.doc_id}")
      require(getShortLe(b, 20) == 1 && getShortLe(b, 22) == 1 &&
        getShortLe(b, 34) == 16, "expected 16-bit mono PCM")
      require(new String(b, 36, 4) == "data", "missing data chunk")
      val n = getIntLe(b, 40) / 2
      var peak = 0
      var zc = 0
      var energy = 0L
      var prev = 0
      var i = 0
      while (i < n) {
        val s = getShortLe(b, 44 + i * 2)
        val a = math.abs(s)
        if (a > peak) peak = a
        if (i > 0 && (s.toLong * prev) < 0) zc += 1
        energy += s.toLong * s
        prev = s
        i += 1
      }
      AudioMeta(blob.doc_id, n, peak, zc, energy)
    }

  /** Derive the synth parameters from the document content hash — md5
    * nibble arithmetic the oracle mirrors (same pattern as m01's dims). */
  private def nib(pos: Int) =
    expr(s"instr('0123456789abcdef', substr(md5(text), $pos, 1)) - 1")
  private def byteAt(firstNibble: Int) = nib(firstNibble) * lit(16) + nib(firstNibble + 1)

  /** Full pipeline over `documents`: params → real WAV payloads → binary
    * column → per-partition parse → typed features.
    */
  def audioFeatures(spark: SparkSession, docs: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    // Layout-conditional spread BEFORE the codec map work: the synthetic
    // corpus is one unsplittable parquet row group — without the exchange
    // the whole synth+decode pipeline fuses into a single task; a
    // well-split production scan gets NO exchange (see MultimodalOps)
    graft.Tables.maybeSpread(
        docs.select(col("doc_id"),
          (byteAt(1) * lit(2) + lit(200)).cast("int").as("n"),
          (byteAt(3) % lit(50) + lit(8)).cast("int").as("period"),
          (byteAt(5) * lit(8) + lit(500)).cast("int").as("amp")))
      .as[(Long, Int, Int, Int)]
      .mapPartitions(synthPartition)
      .mapPartitions(featuresPartition)
  }
}
