package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed by partition-batched decoder functions —
  * the Spark-side pattern for image/audio feature extraction (the
  * Scala analogue of `mapInPandas`: one decoder invocation per
  * partition iterator, vectorizable batch shape, schema declared up
  * front).
  *
  * Two formats have REAL pure-JVM codec paths — WAV (RIFF/PCM16) and
  * PPM (P6) below encode genuine container bytes and decode them from
  * the bytes alone (header walk, little-endian samples, channel
  * de-interleave), oracle-checked end-to-end. For formats that need
  * external codecs (JPEG/MP3/video), `stubDecode` is the declared
  * stand-in: a deterministic byte-level fake keeping the plumbing
  * (binary column, partition batching, feature schema, join-back)
  * real and testable. Swap it for a JNI/ONNX call in production;
  * nothing else changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Long, first_byte: Long,
      stub_feature: Long)

  /** STUB decoder: a real implementation would decode the image/audio
    * payload and run a feature extractor; this computes deterministic
    * byte-level stand-ins with the same batch shape. */
  private def stubDecode(batch: Iterator[MediaRow]): Iterator[MediaFeatures] =
    batch.map { r =>
      val n = r.payload.length.toLong
      val first = if (n > 0) (r.payload(0) & 0xffL) else 0L
      MediaFeatures(r.doc_id, n, first, (n * 31 + first) % 1000)
    }

  /** Documents → binary payload (UTF-8 bytes stand in for media blobs)
    * → partition-batched stub decode → features joined with an md5
    * content digest computed natively by Catalyst. */
  def extractFeatures(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    val features = media.mapPartitions(stubDecode).toDF()
    val digests = docs.select(col("doc_id"), md5(col("text").cast("binary"))
      .as("content_md5"))
    features.join(digests, Seq("doc_id"))
  }

  // ---- Real codec paths (pure JVM, no external libraries) ----------
  //
  // WAV (RIFF/PCM16) and PPM (P6) are simple enough to encode and
  // decode without media libraries, so for these two formats the
  // pipeline is NOT a stub: payloads are genuine container bytes, and
  // the decoders below parse headers and samples from the bytes alone.
  // The payload content derives from a closed-form per-doc formula, so
  // a SQL oracle can compute the expected decoded features without
  // ever seeing the bytes — any encode or decode bug breaks the
  // hash-equality gate.

  case class WavFeatures(doc_id: Long, sample_rate: Long, n_channels: Long,
      n_samples: Long, peak: Long, sum_samples: Long, sum_sq: Long)
  case class PpmFeatures(doc_id: Long, width: Long, height: Long,
      n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Synthesize a real 16-bit mono PCM WAV: 44-byte RIFF header +
    * little-endian samples `s(i) = (doc_id·31 + i·17) mod 4096 − 2048`,
    * `n = 256 + doc_id mod 100` samples at 8 kHz. */
  def wavPayload(docId: Long): Array[Byte] = {
    val n = (256 + docId % 100).toInt
    val rate = 8000
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((docId * 31 + i * 17) % 4096) - 2048).toShort)
      i += 1
    }
    bb.array()
  }

  /** Decode a PCM16 WAV from its bytes alone: validate the RIFF/WAVE
    * magic, walk the chunks to `fmt ` and `data`, then fold the
    * little-endian samples into exact integer statistics. */
  def decodeWav(batch: Iterator[MediaRow]): Iterator[WavFeatures] =
    batch.map { r =>
      val bb = java.nio.ByteBuffer.wrap(r.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def ascii(n: Int): String = {
        val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
      }
      require(ascii(4) == "RIFF"); bb.getInt()
      require(ascii(4) == "WAVE")
      var rate = 0L; var channels = 0L; var bits = 0
      var nSamples = 0L; var peak = 0L; var sum = 0L; var sumSq = 0L
      while (bb.remaining() >= 8) {
        val id = ascii(4); val len = bb.getInt()
        if (id == "fmt ") {
          val p = bb.position()
          bb.getShort() // audio format
          channels = bb.getShort().toLong
          rate = bb.getInt().toLong
          bb.getInt(); bb.getShort() // byte rate, block align
          bits = bb.getShort().toInt
          bb.position(p + len)
        } else if (id == "data") {
          require(bits == 16, s"only PCM16 supported, got $bits-bit")
          var k = 0
          while (k < len / 2) {
            val s = bb.getShort().toLong
            nSamples += 1
            peak = math.max(peak, math.abs(s))
            sum += s
            sumSq += s * s
            k += 1
          }
        } else bb.position(bb.position() + len)
      }
      WavFeatures(r.doc_id, rate, channels, nSamples, peak, sum, sumSq)
    }

  /** Synthesize a real P6 PPM: ASCII header `P6\n<w> <h>\n255\n` +
    * raw RGB bytes `p(j) = (doc_id·7 + j·13) mod 256`,
    * `w = 4 + doc_id mod 5`, `h = 3 + doc_id mod 4`. */
  def ppmPayload(docId: Long): Array[Byte] = {
    val w = (4 + docId % 5).toInt
    val h = (3 + docId % 4).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](3 * w * h)
    var j = 0
    while (j < px.length) {
      px(j) = ((docId * 7 + j * 13) % 256).toByte
      j += 1
    }
    header ++ px
  }

  /** Decode a P6 PPM from its bytes: parse the ASCII header for the
    * dimensions, then accumulate exact per-channel sums. */
  def decodePpm(batch: Iterator[MediaRow]): Iterator[PpmFeatures] =
    batch.map { r =>
      val bytes = r.payload
      // header = first three whitespace-separated tokens after "P6"
      var pos = 0
      def token(): String = {
        while (Character.isWhitespace(bytes(pos))) pos += 1
        val s = pos
        while (!Character.isWhitespace(bytes(pos))) pos += 1
        new String(bytes, s, pos - s, "US-ASCII")
      }
      require(token() == "P6", "not a P6 PPM")
      val w = token().toInt
      val h = token().toInt
      require(token() == "255", "only 8-bit PPM supported")
      pos += 1 // single whitespace after maxval per spec
      var (sumR, sumG, sumB) = (0L, 0L, 0L)
      var j = 0
      val n = 3 * w * h
      while (j < n) {
        val v = (bytes(pos + j) & 0xff).toLong
        (j % 3: @annotation.switch) match {
          case 0 => sumR += v
          case 1 => sumG += v
          case _ => sumB += v
        }
        j += 1
      }
      PpmFeatures(r.doc_id, w.toLong, h.toLong, (w * h).toLong,
        sumR, sumG, sumB)
    }

  case class PngFeatures(doc_id: Long, width: Long, height: Long,
      n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)
  case class Y4mFeatures(doc_id: Long, width: Long, height: Long,
      n_frames: Long, n_sampled: Long, sum_y: Long, sum_u: Long, sum_v: Long)

  /** Synthesize a real PNG (8-bit RGB, non-interlaced): signature,
    * IHDR, one zlib-deflated IDAT, IEND — each chunk CRC32-stamped.
    * Scanlines use filter 0 (None) on the first row and filter 2 (Up)
    * afterwards, so the decoder must genuinely de-filter. Pixel bytes
    * `p(j) = (doc_id·11 + j·19) mod 256` over the row-major RGB
    * stream, `w = 3 + doc_id mod 6`, `h = 2 + doc_id mod 5`. */
  def pngPayload(docId: Long): Array[Byte] = {
    val w = (3 + docId % 6).toInt
    val h = (2 + docId % 5).toInt
    val stride = 3 * w
    // raw pixels, then filtered scanlines (row 0: None, rest: Up)
    val px = Array.tabulate(stride * h)(j => ((docId * 11 + j * 19) % 256).toByte)
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (stride + 1)) = if (y == 0) 0 else 2
      var x = 0
      while (x < stride) {
        val cur = px(y * stride + x) & 0xff
        val up = if (y == 0) 0 else px((y - 1) * stride + x) & 0xff
        raw(y * (stride + 1) + 1 + x) =
          (if (y == 0) cur else (cur - up) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](512)
    while (!deflater.finished())
      zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = zOut.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte) // 8-bit, RGB
      .put(0.toByte).put(0.toByte).put(0.toByte)       // deflate/adaptive/none
      .array()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.empty)
  }

  /** Decode a PNG from its bytes alone: verify the signature, walk the
    * chunks (validating each CRC32), parse IHDR, inflate the IDAT
    * stream, undo scanline filters None/Sub/Up, then accumulate exact
    * per-channel sums. Supports 8-bit RGB non-interlaced — the profile
    * `pngPayload` writes. */
  def decodePng(batch: Iterator[MediaRow]): Iterator[PngFeatures] =
    batch.map { r =>
      val bytes = r.payload
      val bb = java.nio.ByteBuffer.wrap(bytes) // PNG is big-endian
      val sig = new Array[Byte](8); bb.get(sig)
      require(sig(0) == 0x89.toByte && sig(1) == 'P' && sig(2) == 'N' &&
        sig(3) == 'G', "not a PNG")
      var w = 0; var h = 0
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && bb.remaining() >= 12) {
        val len = bb.getInt()
        val typBytes = new Array[Byte](4); bb.get(typBytes)
        val typ = new String(typBytes, "US-ASCII")
        val data = new Array[Byte](len); bb.get(data)
        val crc = new java.util.zip.CRC32()
        crc.update(typBytes); crc.update(data)
        require(crc.getValue.toInt == bb.getInt(), s"bad CRC in $typ")
        typ match {
          case "IHDR" =>
            val ib = java.nio.ByteBuffer.wrap(data)
            w = ib.getInt(); h = ib.getInt()
            require(ib.get() == 8 && ib.get() == 2,
              "only 8-bit RGB supported")
            ib.get(); ib.get()
            require(ib.get() == 0, "interlaced PNG not supported")
          case "IDAT" => idat.write(data)
          case "IEND" => done = true
          case _      => () // ancillary chunk — skip
        }
      }
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val stride = 3 * w
      val raw = new Array[Byte]((stride + 1) * h)
      var off = 0
      while (!inflater.finished() && off < raw.length)
        off += inflater.inflate(raw, off, raw.length - off)
      inflater.end()
      require(off == raw.length, "truncated IDAT stream")
      // de-filter into recovered pixels
      val px = new Array[Int](stride * h)
      var y = 0
      while (y < h) {
        val filter = raw(y * (stride + 1)) & 0xff
        var x = 0
        while (x < stride) {
          val v = raw(y * (stride + 1) + 1 + x) & 0xff
          val left = if (x >= 3) px(y * stride + x - 3) else 0
          val up = if (y > 0) px((y - 1) * stride + x) else 0
          px(y * stride + x) = (filter: @annotation.switch) match {
            case 0 => v
            case 1 => (v + left) & 0xff
            case 2 => (v + up) & 0xff
            case _ => sys.error(s"unsupported PNG filter $filter")
          }
          x += 1
        }
        y += 1
      }
      var (sumR, sumG, sumB) = (0L, 0L, 0L)
      var j = 0
      while (j < px.length) {
        (j % 3: @annotation.switch) match {
          case 0 => sumR += px(j)
          case 1 => sumG += px(j)
          case _ => sumB += px(j)
        }
        j += 1
      }
      PngFeatures(r.doc_id, w.toLong, h.toLong, (w * h).toLong,
        sumR, sumG, sumB)
    }

  /** Synthesize a real YUV4MPEG2 (Y4M) clip: ASCII stream header, then
    * per-frame `FRAME\n` markers + planar YUV 4:2:0 bytes. Frame `f`'s
    * payload byte `j` (over the concatenated Y,U,V planes, length
    * `w·h·3/2`) is `(doc_id·13 + f·7 + j·23) mod 256`;
    * `w = 4 + 2·(doc_id mod 3)`, `h = 4 + 2·(doc_id mod 2)`,
    * `n_frames = 3 + doc_id mod 6`. */
  def y4mPayload(docId: Long): Array[Byte] = {
    val w = (4 + 2 * (docId % 3)).toInt
    val h = (4 + 2 * (docId % 2)).toInt
    val nFrames = (3 + docId % 6).toInt
    val frameLen = w * h * 3 / 2
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(header, 0, header.length)
    val marker = "FRAME\n".getBytes("US-ASCII")
    var f = 0
    while (f < nFrames) {
      out.write(marker, 0, marker.length)
      var j = 0
      while (j < frameLen) {
        out.write(((docId * 13 + f * 7 + j * 23) % 256).toInt)
        j += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Decode a Y4M clip and FRAME-SAMPLE it: parse the stream header
    * for W/H, walk the `FRAME` markers, and accumulate exact per-plane
    * sums over every `step`-th frame only — the distributed shape of
    * video keyframe extraction (decode is per-row, sampling drops work
    * before any shuffle). */
  def decodeY4m(step: Int)(batch: Iterator[MediaRow]): Iterator[Y4mFeatures] =
    batch.map { r =>
      val bytes = r.payload
      var pos = 0
      def line(): String = {
        val s = pos
        while (bytes(pos) != '\n') pos += 1
        pos += 1
        new String(bytes, s, pos - 1 - s, "US-ASCII")
      }
      val header = line().split(' ')
      require(header(0) == "YUV4MPEG2", "not a Y4M stream")
      val w = header.collectFirst { case p if p.startsWith("W") => p.tail.toInt }.get
      val h = header.collectFirst { case p if p.startsWith("H") => p.tail.toInt }.get
      val ySize = w * h
      val cSize = ySize / 4
      val frameLen = ySize + 2 * cSize
      var nFrames = 0L; var nSampled = 0L
      var sumY = 0L; var sumU = 0L; var sumV = 0L
      while (pos < bytes.length) {
        require(line().startsWith("FRAME"), "bad FRAME marker")
        if (nFrames % step == 0) {
          nSampled += 1
          var j = 0
          while (j < frameLen) {
            val v = (bytes(pos + j) & 0xff).toLong
            if (j < ySize) sumY += v
            else if (j < ySize + cSize) sumU += v
            else sumV += v
            j += 1
          }
        }
        pos += frameLen
        nFrames += 1
      }
      Y4mFeatures(r.doc_id, w.toLong, h.toLong, nFrames, nSampled,
        sumY, sumU, sumV)
    }

  /** Docs → real PNG bytes → chunk-walk + inflate + de-filter → exact
    * per-channel sums. */
  def pngFeatures(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, pngPayload(id)))
      .mapPartitions(decodePng).toDF()
  }

  /** Docs → real Y4M bytes → frame-sampled decode (every 2nd frame). */
  def y4mFeatures(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, y4mPayload(id)))
      .mapPartitions(decodeY4m(2)).toDF()
  }

  /** Nearest-neighbor downscale of a decoded P6 PPM: target
    * `(max(1, w/2), max(1, h/2))`, source pixel = `(2x, 2y)` —
    * RE-ENCODED to genuine container bytes, so the output of the
    * resize stage is itself a valid PPM (the shape of a real
    * image-preprocessing pipeline: decode → transform → encode). */
  def resizePpmHalf(payload: Array[Byte]): Array[Byte] = {
    val bytes = payload
    var pos = 0
    def token(): String = {
      while (Character.isWhitespace(bytes(pos))) pos += 1
      val s = pos
      while (!Character.isWhitespace(bytes(pos))) pos += 1
      new String(bytes, s, pos - s, "US-ASCII")
    }
    require(token() == "P6", "not a P6 PPM")
    val w = token().toInt
    val h = token().toInt
    require(token() == "255", "only 8-bit PPM supported")
    pos += 1
    val w2 = math.max(1, w / 2)
    val h2 = math.max(1, h / 2)
    val header = s"P6\n$w2 $h2\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](3 * w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        var c = 0
        while (c < 3) {
          out(3 * (y * w2 + x) + c) = bytes(pos + 3 * (2 * y * w + 2 * x) + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    header ++ out
  }

  /** Docs → real PPM bytes → nearest-neighbor half resize (re-encoded
    * container) → decode of the RESIZED bytes → exact features. Any
    * bug in the resize index math or the re-encode breaks the
    * closed-form oracle. */
  def ppmResizeFeatures(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, resizePpmHalf(ppmPayload(id))))
      .mapPartitions(decodePpm).toDF()
  }

  /** Docs → real WAV bytes → header+sample decode → exact features. */
  def wavFeatures(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, wavPayload(id)))
      .mapPartitions(decodeWav).toDF()
  }

  /** Docs → real PPM bytes → header+pixel decode → exact features. */
  def ppmFeatures(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, ppmPayload(id)))
      .mapPartitions(decodePpm).toDF()
  }
}
