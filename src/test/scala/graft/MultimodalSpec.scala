package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.MediaRow

/** The media decoders must parse real container bytes — including
  * containers this codebase did not produce — and reject payloads that
  * are not what they claim to be. (Mostly no Spark needed: the codecs
  * are plain iterator functions, the cluster plumbing is
  * oracle-checked by pipe_media_wav / pipe_media_ppm; only the banded
  * near-dup completeness sweep spins a session.)
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .appName("graft-multimodal")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("near-dup banding derived from tau stays complete past the default") {
    // pigeonhole completeness for EVERY legal tau, not just the
    // pinned tau=2 oracle row: tau+1 disjoint bands guarantee that
    // tau differing bits leave at least one band untouched — compare
    // the banded candidate formulation against exact all-pairs
    // Hamming computed from the same signatures in-process
    val sqlc = spark
    import sqlc.implicits._
    val ids = (0L until 80L).toVector
    val docs = ids.toDF("doc_id")
    val sigs = ids.map(id => id -> Multimodal.decodePpmHash(
      Iterator(MediaRow(id, Multimodal.ppmPayload(id)))).next().ahash).toMap
    Seq(0, 1, 3, 5).foreach { tau =>
      val got = Multimodal.ppmHashNearDup(docs, spark, tau)
        .select("doc_id", "near_min_id", "n_near").collect()
        .map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2)))
        .toMap
      ids.foreach { d =>
        val near = ids.filter(o => o != d &&
          java.lang.Long.bitCount(sigs(o) ^ sigs(d)) <= tau)
        assert(got(d)._2 == near.size.toLong, s"tau=$tau doc=$d count")
        assert(got(d)._1 == near.minOption, s"tau=$tau doc=$d min id")
      }
    }
    // 16-bit hashes: tau past 15 is meaningless (every pair matches)
    intercept[IllegalArgumentException](
      Multimodal.ppmHashNearDup(docs, spark, 16))
  }

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

  test("ppm aHash matches the closed-form pixel formula and flags a uniform image") {
    // independent Scala recomputation from the payload FORMULA (never
    // the bytes): any sampling/threshold/bit-order drift in the
    // decoder diverges here before the oracle sees it
    (0L to 40L).foreach { id =>
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      def px(j: Int): Long = (id * 7 + j * 13) % 256
      val lum = for (gy <- 0 until 4; gx <- 0 until 4) yield {
        val base = 3 * ((gy * h / 4) * w + (gx * w / 4))
        px(base) + px(base + 1) + px(base + 2)
      }
      val tot = lum.sum
      val expected = lum.zipWithIndex
        .map { case (l, i) => if (l * 16 > tot) 1L << i else 0L }.sum
      val got = Multimodal
        .decodePpmHash(Iterator(MediaRow(id, Multimodal.ppmPayload(id))))
        .next()
      assert(got.ahash == expected, s"doc $id")
      assert(got.width == w && got.height == h)
    }
    // a constant image has no cell strictly above the mean → hash 0
    val flat = "P6\n4 4\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](48)(77)
    assert(Multimodal.decodePpmHash(Iterator(MediaRow(1L, flat)))
      .next().ahash == 0L)
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

  test("png decoder reads a foreign-built container with ancillary chunks") {
    // hand-build a 2x2 RGB PNG using Sub filters (a path pngPayload
    // never emits) plus a tEXt chunk the walk must skip
    val stride = 6
    val px = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val raw = new Array[Byte]((stride + 1) * 2)
    for (y <- 0 until 2) {
      raw(y * (stride + 1)) = 1 // Sub
      for (x <- 0 until stride) {
        val cur = px(y * stride + x)
        val left = if (x >= 3) px(y * stride + x - 3) else 0
        raw(y * (stride + 1) + 1 + x) = ((cur - left) & 0xff).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](256)
    val idat = java.util.Arrays.copyOf(buf, deflater.deflate(buf))
    deflater.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(2).putInt(2)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
      .put(0.toByte).array()
    val payload =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        chunk("IHDR", ihdr) ++
        chunk("tEXt", "comment\u0000hi".getBytes("US-ASCII")) ++
        chunk("IDAT", idat) ++ chunk("IEND", Array.empty)
    val f = Multimodal.decodePng(Iterator(MediaRow(9L, payload))).next()
    assert(f.width == 2L && f.height == 2L && f.n_pixels == 4L)
    assert(f.sum_r == 10L + 40 + 70 + 100)
    assert(f.sum_g == 20L + 50 + 80 + 110)
    assert(f.sum_b == 30L + 60 + 90 + 120)
  }

  test("png decoder rejects corrupted CRC and junk") {
    val good = Multimodal.pngPayload(5L)
    val bad = good.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0xff).toByte // flip IEND CRC
    intercept[IllegalArgumentException] {
      Multimodal.decodePng(Iterator(MediaRow(5L, bad))).next()
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePng(Iterator(MediaRow(1L,
        "not a png at all .......".getBytes("US-ASCII")))).next()
    }
  }

  test("jpeg round-trips the DC-exact profile and decodes general streams") {
    // closed-form round-trip across several shapes (1-3 x 1-2 blocks)
    (0L to 11L).foreach { id =>
      val f = Multimodal.decodeJpeg(
        Iterator(MediaRow(id, Multimodal.jpegPayload(id)))).next()
      val bw = 1 + id % 3; val bh = 1 + id % 2
      assert(f.width == 8 * bw && f.height == 8 * bh)
      assert(f.n_pixels == 64 * bw * bh)
      val expected = (0L until bw * bh)
        .map(b => 64L * ((id * 17 + b * 29) % 256)).sum
      assert(f.sum_luma == expected, s"doc $id")
    }
  }

  test("jpeg decoder rejects corrupted streams") {
    intercept[IllegalArgumentException] { // no SOI
      Multimodal.decodeJpeg(Iterator(MediaRow(1L,
        "definitely not a jpeg".getBytes("US-ASCII")))).next()
    }
    val good = Multimodal.jpegPayload(3L)
    intercept[IllegalArgumentException] { // truncated entropy stream
      Multimodal.decodeJpeg(Iterator(
        MediaRow(3L, good.take(good.length - 8)))).next()
    }
    // a raw 0xFF inside entropy data (lost stuffing byte) is a marker
    intercept[Exception] {
      val bad = good.clone()
      // find the SOS payload start and smash a byte to 0xFF twice over
      val sos = (0 until bad.length - 1).indexWhere(i =>
        (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xda)
      bad(sos + 10) = 0xff.toByte
      bad(sos + 11) = 0xd9.toByte
      Multimodal.decodeJpeg(Iterator(MediaRow(3L, bad))).next()
    }
  }

  test("y4m frame sampling decodes every step-th frame only") {
    val payload = Multimodal.y4mPayload(4L) // w=6, h=4, 7 frames
    val all = Multimodal.decodeY4m(1)(Iterator(MediaRow(4L, payload))).next()
    val sampled = Multimodal.decodeY4m(2)(Iterator(MediaRow(4L, payload))).next()
    assert(all.n_frames == 7L && all.n_sampled == 7L)
    assert(sampled.n_frames == 7L && sampled.n_sampled == 4L)
    // closed-form check of the sampled Y-plane sum (frames 0,2,4,6)
    val ySize = 6 * 4
    val expected = (for {
      f <- Seq(0, 2, 4, 6); j <- 0 until ySize
    } yield (4L * 13 + f * 7 + j * 23) % 256).sum
    assert(sampled.sum_y == expected)
    assert(all.sum_y > sampled.sum_y)
  }

  test("ppm half-resize produces a valid container with sampled pixels") {
    // 4x2 source: resized 2x1 takes pixels (0,0) and (2,0)
    val src = new Array[Byte](3 * 4 * 2)
    src.indices.foreach(j => src(j) = j.toByte)
    val payload = "P6\n4 2\n255\n".getBytes("US-ASCII") ++ src
    val resized = Multimodal.resizePpmHalf(payload)
    val f = Multimodal.decodePpm(Iterator(MediaRow(1L, resized))).next()
    assert(f.width == 2L && f.height == 1L)
    assert(f.sum_r == 0L + 6L && f.sum_g == 1L + 7L && f.sum_b == 2L + 8L)
    // degenerate 1-wide source stays 1-wide (max(1, w/2))
    val thin = "P6\n1 3\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val tf = Multimodal.decodePpm(Iterator(
      MediaRow(2L, Multimodal.resizePpmHalf(thin)))).next()
    assert(tf.width == 1L && tf.height == 1L && tf.sum_r == 1L)
  }

  test("ppm letterbox preserves aspect and pads with black") {
    // 4x2 source into 4x4: sw=4, sh=2, centered at y0=1 — rows 0 and
    // 3 are pure padding, rows 1-2 are the unscaled source pixels
    val src = new Array[Byte](3 * 4 * 2)
    src.indices.foreach(j => src(j) = (j + 1).toByte)
    val payload = "P6\n4 2\n255\n".getBytes("US-ASCII") ++ src
    val boxed = Multimodal.letterboxPpm(payload, side = 4)
    val f = Multimodal.decodePpm(Iterator(MediaRow(1L, boxed))).next()
    assert(f.width == 4L && f.height == 4L && f.n_pixels == 16L)
    // padding adds zero: sums equal the source channel sums exactly
    val sums = src.zipWithIndex.groupBy(_._2 % 3).view
      .mapValues(_.map(_._1.toLong & 0xffL).sum).toMap
    assert(f.sum_r == sums(0) && f.sum_g == sums(1) && f.sum_b == sums(2))
    // the padding rows really are black
    val body = boxed.drop("P6\n4 4\n255\n".length)
    assert(body.slice(0, 12).forall(_ == 0))           // row 0
    assert(body.slice(36, 48).forall(_ == 0))          // row 3
    // a tall thin source pads horizontally instead
    val thin = "P6\n1 3\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val tf = Multimodal.decodePpm(Iterator(
      MediaRow(2L, Multimodal.letterboxPpm(thin, side = 3)))).next()
    assert(tf.width == 3L && tf.height == 3L)
    assert(tf.sum_r == 1L + 4L + 7L)
  }

  test("png/y4m encode-decode round trip matches the closed form") {
    (0L to 50L).foreach { id =>
      val g = Multimodal.decodePng(
        Iterator(MediaRow(id, Multimodal.pngPayload(id)))).next()
      val (w, h) = ((3 + id % 6).toInt, (2 + id % 5).toInt)
      assert(g.width == w && g.height == h)
      val px = (0 until 3 * w * h).map(j => (id * 11 + j * 19) % 256)
      assert(g.sum_r == px.zipWithIndex.collect { case (v, j) if j % 3 == 0 => v }.sum)
      assert(g.sum_b == px.zipWithIndex.collect { case (v, j) if j % 3 == 2 => v }.sum)
      val v = Multimodal.decodeY4m(2)(
        Iterator(MediaRow(id, Multimodal.y4mPayload(id)))).next()
      assert(v.n_frames == 3 + id % 6)
      assert(v.n_sampled == (v.n_frames + 1) / 2)
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
