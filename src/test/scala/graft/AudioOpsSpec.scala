package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AudioOps

/** WAV container round-trip: the features the parse pass extracts from the
  * encoded PCM must equal the closed-form square-wave values the oracle
  * uses — and the container must be a well-formed RIFF/WAVE file.
  */
class AudioOpsSpec extends AnyFunSuite {

  test("synth -> parse round-trip matches closed-form features") {
    for ((n, period, amp) <- Seq((200, 8, 500), (411, 57, 2540), (710, 13, 1004))) {
      val blob = AudioOps.synthPartition(Iterator((7L, n, period, amp))).next()
      // container shape: 44-byte header + 2 bytes per sample
      assert(blob.payload.length === 44 + n * 2)
      assert(new String(blob.payload, 0, 4) === "RIFF")
      assert(new String(blob.payload, 8, 4) === "WAVE")
      val m = AudioOps.featuresPartition(Iterator(blob)).next()
      assert(m.n_samples === n)
      assert(m.peak === amp)
      assert(m.energy === n.toLong * amp * amp)
      // closed form: sign changes of the square wave
      val expectZc = (1 until n).count { i =>
        (((i - 1) % period) * 2 < period) != ((i % period) * 2 < period)
      }
      assert(m.zero_crossings === expectZc)
    }
  }

  test("a JDK audio reader accepts the container") {
    // javax.sound.sampled ships in the JDK: the synthesized payload must
    // parse as real audio, not just satisfy our own reader
    val blob = AudioOps.synthPartition(Iterator((1L, 300, 10, 800))).next()
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob.payload))
    val fmt = in.getFormat
    assert(fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 16)
    assert(fmt.getSampleRate === AudioOps.SampleRate.toFloat)
    assert(in.getFrameLength === 300L)
  }
}
