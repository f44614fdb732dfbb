package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.MediaRow

/** The media decoders must parse real container bytes — including
  * containers this codebase did not produce — and reject payloads that
  * are not what they claim to be. (No Spark needed: the codecs are
  * plain iterator functions, the cluster plumbing is oracle-checked by
  * pipe_media_wav / pipe_media_ppm.)
  */
class MultimodalSpec extends AnyFunSuite {

  test("wav decoder reads a foreign-built PCM16 container") {
    // hand-build a WAV that the encoder code path never produced:
    // 3 samples, stereo channel count in fmt, plus a skippable chunk
    val samples = Seq[Short](100, -200, 32767)
    val bb = java.nio.ByteBuffer.allocate(44 + 8 + 4 + samples.size * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 12 + samples.size * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 4)
      .putShort(4).putShort(16)
      .put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII")) // extra chunk the walk must skip
      .put("data".getBytes("US-ASCII")).putInt(samples.size * 2)
    samples.foreach(bb.putShort)
    val f = Multimodal.decodeWav(Iterator(MediaRow(7L, bb.array()))).next()
    assert(f.sample_rate == 44100L && f.n_channels == 2L)
    assert(f.n_samples == 3L && f.peak == 32767L)
    assert(f.sum_samples == 100L - 200L + 32767L)
    assert(f.sum_sq == 100L * 100 + 200L * 200 + 32767L * 32767)
  }

  test("ppm decoder reads a foreign-built P6 with comment-free header") {
    val px = Array[Byte](10, 20, 30, 40, 50, 60) // 2x1 RGB
    val payload = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ px
    val f = Multimodal.decodePpm(Iterator(MediaRow(3L, payload))).next()
    assert(f.width == 2L && f.height == 1L && f.n_pixels == 2L)
    assert(f.sum_r == 10L + 40 && f.sum_g == 20L + 50 && f.sum_b == 30L + 60)
  }

  test("decoders reject payloads that are not their format") {
    val junk = "this is not a media file".getBytes("US-ASCII")
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(Iterator(MediaRow(1L, junk))).next()
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(Iterator(MediaRow(1L, junk))).next()
    }
    // a PGM (P5) is a real image but the wrong subformat
    val pgm = "P5\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2)
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(Iterator(MediaRow(1L, pgm))).next()
    }
  }

  test("encode-decode round trip matches the closed form") {
    (0L to 50L).foreach { id =>
      val w = Multimodal.decodeWav(
        Iterator(MediaRow(id, Multimodal.wavPayload(id)))).next()
      val n = 256 + id % 100
      assert(w.n_samples == n && w.sample_rate == 8000L && w.n_channels == 1L)
      val samples = (0L until n).map(i => (id * 31 + i * 17) % 4096 - 2048)
      assert(w.peak == samples.map(math.abs).max)
      assert(w.sum_samples == samples.sum)
      val p = Multimodal.decodePpm(
        Iterator(MediaRow(id, Multimodal.ppmPayload(id)))).next()
      assert(p.width == 4 + id % 5 && p.height == 3 + id % 4)
    }
  }
}
