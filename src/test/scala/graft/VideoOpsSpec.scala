package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VideoOps

/** The framed-PNG container round-trip behind m03: geometry and features
  * must come back out of real decoded frames, and the stride must control
  * exactly which frames get decoded.
  */
class VideoOpsSpec extends AnyFunSuite {

  private def clip(id: Long, nFrames: Int, w: Int, h: Int) =
    VideoOps.encodePartition(Iterator((id, nFrames, w, h))).next()

  test("stride-3 sampling decodes frames 0,3,6,... and sums their ids") {
    val c = clip(7L, 10, 5, 4)
    val s = VideoOps.samplePartition(3)(Iterator(c)).next()
    assert(s.doc_id === 7L)
    assert(s.n_frames === 10)
    assert(s.n_sampled === 4) // frames 0, 3, 6, 9
    assert(s.width === 5 && s.height === 4)
    assert(s.n_pixels_sampled === 4L * 5 * 4)
    assert(s.sum_frame_ids === 0L + 3 + 6 + 9) // only from decoded pixels
  }

  test("stride-1 decodes every frame") {
    val c = clip(1L, 6, 2, 3)
    val s = VideoOps.samplePartition(1)(Iterator(c)).next()
    assert(s.n_sampled === 6)
    assert(s.sum_frame_ids === (0 until 6).sum.toLong)
  }

  test("payloads are framed PNG containers, not raw feature bytes") {
    val c = clip(2L, 3, 4, 4)
    // magic "GVF0", then 3 length-prefixed PNG frames (PNG signature)
    assert(c.payload.slice(0, 4).sameElements("GVF0".getBytes))
    val nFrames = java.nio.ByteBuffer.wrap(c.payload, 4, 4).getInt
    assert(nFrames === 3)
    val len0 = java.nio.ByteBuffer.wrap(c.payload, 8, 4).getInt
    assert(len0 > 0)
    val pngSig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    assert(c.payload.slice(12, 16).sameElements(pngSig))
  }

  test("skipped frames are hopped by length, never decoded") {
    val c = clip(3L, 4, 3, 3)
    // corrupt frame 1's PNG bytes (it is skipped at stride 2: sampled are
    // 0 and 2) — sampling must still succeed because frame 1 is never
    // parsed, only hopped over by its length prefix
    val buf = c.payload.clone()
    var off = 8 // past magic + count
    val len0 = java.nio.ByteBuffer.wrap(buf, off, 4).getInt
    off += 4 + len0 // start of frame 1's length prefix
    val len1 = java.nio.ByteBuffer.wrap(buf, off, 4).getInt
    java.util.Arrays.fill(buf, off + 4, off + 4 + len1, 0x00.toByte)
    val s = VideoOps.samplePartition(2)(Iterator(VideoOps.Clip(3L, buf))).next()
    assert(s.n_sampled === 2)
    assert(s.sum_frame_ids === 0L + 2)
  }
}
