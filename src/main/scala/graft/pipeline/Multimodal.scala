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
  * Five formats have REAL pure-JVM codec paths — WAV (RIFF/PCM16),
  * PPM (P6), PNG (zlib + CRC32 + scanline filters), Y4M (YUV 4:2:0
  * frame sampling) and baseline JPEG (canonical Huffman + DCT) below
  * encode genuine container bytes and decode them from the bytes
  * alone, oracle-checked end-to-end. For formats that genuinely need
  * external codecs (MP3/video codecs), `stubDecode` is the declared
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

  case class WavZcr(doc_id: Long, n_samples: Long, zero_crossings: Long,
      peak: Long)

  /** Audio feature extraction beyond container stats: zero-crossing
    * count over the decoded PCM16 samples (`s(i−1)·s(i) < 0` — the
    * strict sign flip, integer-exact), the classic
    * voiced/unvoiced/noise discriminator a speech-data curation pass
    * filters on. Same chunk walk as [[decodeWav]]; per-row state is
    * one previous sample. */
  def decodeWavZcr(batch: Iterator[MediaRow]): Iterator[WavZcr] =
    batch.map { r =>
      val bb = java.nio.ByteBuffer.wrap(r.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def ascii(n: Int): String = {
        val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
      }
      require(ascii(4) == "RIFF"); bb.getInt()
      require(ascii(4) == "WAVE")
      var bits = 0
      var nSamples = 0L; var zc = 0L; var peak = 0L
      var prev = 0L; var first = true
      while (bb.remaining() >= 8) {
        val id = ascii(4); val len = bb.getInt()
        if (id == "fmt ") {
          val p = bb.position()
          bb.getShort(); bb.getShort(); bb.getInt(); bb.getInt()
          bb.getShort()
          bits = bb.getShort().toInt
          bb.position(p + len)
        } else if (id == "data") {
          require(bits == 16, s"only PCM16 supported, got $bits-bit")
          var k = 0
          while (k < len / 2) {
            val s = bb.getShort().toLong
            nSamples += 1
            peak = math.max(peak, math.abs(s))
            if (!first && prev * s < 0) zc += 1
            prev = s; first = false
            k += 1
          }
        } else bb.position(bb.position() + len)
      }
      WavZcr(r.doc_id, nSamples, zc, peak)
    }

  def wavZcrFeatures(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, wavPayload(id)))
      .mapPartitions(decodeWavZcr).toDF()
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

  case class PpmHash(doc_id: Long, width: Long, height: Long, ahash: Long)

  /** 4×4 average-hash (aHash) of a P6 PPM, decoded from the bytes
    * alone: nearest-neighbor-sample a 4×4 grid (cell (gy,gx) reads
    * pixel (⌊gx·w/4⌋, ⌊gy·h/4⌋)), luma = r+g+b per cell (exact
    * integers), bit gy·4+gx set iff 16·luma > Σ lumas (strictly
    * above the mean, multiplication instead of division so the
    * comparison is integer-exact). The standard first-stage image
    * near-dup signature: re-encodes, minor crops and brightness-scale
    * changes preserve the bit pattern. */
  def decodePpmHash(batch: Iterator[MediaRow]): Iterator[PpmHash] =
    batch.map { r =>
      val bytes = r.payload
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
      val lum = new Array[Long](16)
      var gy = 0
      while (gy < 4) {
        var gx = 0
        while (gx < 4) {
          val x = gx * w / 4
          val y = gy * h / 4
          val base = pos + 3 * (y * w + x)
          lum(gy * 4 + gx) = (bytes(base) & 0xff).toLong +
            (bytes(base + 1) & 0xff) + (bytes(base + 2) & 0xff)
          gx += 1
        }
        gy += 1
      }
      val tot = lum.sum
      var sig = 0L
      var i = 0
      while (i < 16) {
        if (lum(i) * 16 > tot) sig |= (1L << i)
        i += 1
      }
      PpmHash(r.doc_id, w.toLong, h.toLong, sig)
    }

  /** Image near-dup dedup by perceptual hash — the [[decodePpmHash]]
    * signature under the `exactDedup` keeper discipline: every image
    * mapped to the minimal doc_id of its aHash group. Scale shape: the
    * decode is partition-local `mapPartitions` (binary in, 4 longs
    * out); the grouping is one window keyed by the 16-bit hash —
    * uniform content-derived keys, the same class as text exactDedup.
    * The ORACLE computes the expected hash from the payload's
    * closed-form pixel formula without ever seeing bytes, so any
    * encode, decode, sampling or threshold bug breaks hash equality. */
  def ppmHashDedup(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sigs = docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, ppmPayload(id)))
      .mapPartitions(decodePpmHash).toDF()
    val w = Window.partitionBy("ahash")
    sigs
      .withColumn("keep_id", min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
  }

  /** Image NEAR-dup by perceptual-hash Hamming distance — the SimHash
    * pigeonhole discipline applied to the multimodal tier: two 16-bit
    * aHashes within Hamming ≤ τ must agree EXACTLY on at least one of
    * τ+1 disjoint bit bands (τ differing bits can touch at most τ
    * bands — the band count is DERIVED from τ, so the pigeonhole is
    * complete for every legal τ, not just the default; at τ = 2 the
    * split is the historical 6/5/5). Candidates come from a band
    * equi-join on content-derived keys (uniform, skew-free) and only
    * candidates pay the exact `bit_count(xor)` residual — never an
    * all-pairs image comparison. Per image: minimal near neighbor,
    * distinct neighbor count, and the keeper verdict
    * (`near_min_id < doc_id`, the incremental-dedup rule). The ORACLE
    * is the opposite formulation — exact all-pairs Hamming in SQL — so
    * a band-split bug that loses a candidate breaks hash equality. */
  def ppmHashNearDup(docs: DataFrame, spark: SparkSession,
      tau: Int = 2): DataFrame = {
    import spark.implicits._
    // τ+1 bands over 16 bits needs every band non-empty; τ ≥ 16 would
    // admit all pairs anyway (16-bit hashes are always within 16)
    require(tau >= 0 && tau < 16, s"tau must be in [0, 15], got $tau")
    val nBands = tau + 1
    // near-equal widths, wider bands first (τ=2 ⇒ 6/5/5, low bits first)
    val widths = Array.tabulate(nBands)(i =>
      16 / nBands + (if (i < 16 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val sigs = docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, ppmPayload(id)))
      .mapPartitions(decodePpmHash).toDF()
      .select(col("doc_id"), col("ahash"))
      .localCheckpoint(false) // sig pass runs once, feeds both sides
    val bandCols = (0 until nBands).map { i =>
      shiftright(col("ahash"), offsets(i))
        .bitwiseAND(lit((1L << widths(i)) - 1L))
    }
    val banded = sigs.select(col("doc_id"), col("ahash"),
      posexplode(array(bandCols: _*)).as(Seq("band", "key")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("d"), col("b.doc_id").as("o"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= tau)
    val near = cand.groupBy(col("d").as("doc_id"))
      .agg(min("o").as("near_min_id"),
        countDistinct("o").as("n_near"))
    sigs.join(near, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ahash"), col("near_min_id"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        coalesce(col("near_min_id") < col("doc_id"), lit(false))
          .as("is_near_dup"))
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

  case class Y4mFrameDiff(doc_id: Long, frame_no: Long, sad_y: Long)

  /** Temporal frame difference over a decoded Y4M clip: per adjacent
    * frame pair, the sum of absolute per-pixel differences of the LUMA
    * plane (SAD — the standard shot-boundary/scene-cut signal; a video
    * curation pass thresholds it to drop static clips and find cuts).
    * Decode state is one previous Y plane (O(w·h)); one output row per
    * (clip, frame ≥ 1), all-integer. */
  def decodeY4mSad(batch: Iterator[MediaRow]): Iterator[Y4mFrameDiff] =
    batch.flatMap { r =>
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
      val frameLen = ySize + 2 * (ySize / 4)
      var prev: Array[Int] = null
      var f = 0L
      val out = scala.collection.mutable.ArrayBuffer.empty[Y4mFrameDiff]
      while (pos < bytes.length) {
        require(line().startsWith("FRAME"), "bad FRAME marker")
        val cur = new Array[Int](ySize)
        var j = 0
        while (j < ySize) { cur(j) = bytes(pos + j) & 0xff; j += 1 }
        if (prev != null) {
          var sad = 0L; var i = 0
          while (i < ySize) { sad += math.abs(cur(i) - prev(i)); i += 1 }
          out += Y4mFrameDiff(r.doc_id, f, sad)
        }
        prev = cur
        pos += frameLen
        f += 1
      }
      out
    }

  /** Docs → real Y4M bytes → per-adjacent-frame luma SAD. */
  def y4mFrameDiffs(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, y4mPayload(id)))
      .mapPartitions(decodeY4mSad).toDF()
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

  /** Letterbox a P6 PPM into a `side`×`side` square: the image scales
    * to fit while PRESERVING aspect (nearest-neighbor, integer floor
    * maps — `sx = x·w/sw` — so both engines agree exactly) and the
    * borders pad with black — the standard pad-to-square every
    * image-training pipeline applies before batching (a plain resize
    * distorts aspect; crops lose content). Pure byte→byte transform:
    * the output is itself a valid PPM, so the feature pass reuses
    * [[decodePpm]] unchanged. */
  def letterboxPpm(payload: Array[Byte], side: Int = 8): Array[Byte] = {
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
    val m = math.max(w, h)
    val sw = math.max(1, w * side / m)
    val sh = math.max(1, h * side / m)
    val x0 = (side - sw) / 2
    val y0 = (side - sh) / 2
    val header = s"P6\n$side $side\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](3 * side * side) // zero-filled = black pad
    var y = 0
    while (y < sh) {
      val sy = y * h / sh
      var x = 0
      while (x < sw) {
        val sx = x * w / sw
        var c = 0
        while (c < 3) {
          out(3 * ((y0 + y) * side + (x0 + x)) + c) =
            bytes(pos + 3 * (sy * w + sx) + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    header ++ out
  }

  /** Docs → real PPM bytes → letterbox to a square (re-encoded
    * container) → decode of the PADDED bytes → exact features. */
  def ppmLetterboxFeatures(docs: DataFrame, spark: SparkSession,
      side: Int = 8): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, letterboxPpm(ppmPayload(id), side)))
      .mapPartitions(decodePpm).toDF()
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

  // ---- Baseline JPEG (ITU T.81), grayscale, pure JVM ----------------
  //
  // A real DCT entropy-coded format behind the multimodal seam: the
  // encoder writes genuine SOI/DQT/SOF0/DHT/SOS/EOI markers, canonical
  // Huffman codes generated from the Annex K table definitions, DC
  // prediction, byte-stuffed entropy data; the decoder is table-driven
  // (it builds its Huffman tables from the file's own DHT segments) and
  // runs real dequantize → de-zigzag → separable float IDCT → clamp.
  //
  // Oracle exactness: JPEG is lossy in general, so the synthesized
  // profile is chosen to round-trip bit-exactly — per-8×8-block
  // CONSTANT pixels (DC-only spectra: the forward DCT of a constant
  // block is exactly 8·(v−128) in the DC slot and 0 elsewhere) and an
  // all-ones quantization table (values 1..255 are spec-legal). The
  // IDCT of a DC-only block reconstructs the constant exactly (float
  // error ~1e-13, well inside the round-to-int radius), so a SQL
  // oracle computes decoded sums in closed form while the codec still
  // exercises every stage a lossy image would.

  case class JpegFeatures(doc_id: Long, width: Long, height: Long,
      n_pixels: Long, sum_luma: Long)

  /** Annex K (K.3.1) luminance DC Huffman spec: code counts by length
    * 1..16, then the symbol values (categories 0..11). */
  private val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray

  /** Annex K (K.3.2) luminance AC Huffman spec. */
  private val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Zigzag scan order: index = scan position, value = block offset. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman codes per T.81 C.2: symbol → (code, length). */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Synthesize a real baseline grayscale JPEG. Dimensions are whole
    * blocks (`w = 8·(1 + doc_id mod 3)`, `h = 8·(1 + doc_id mod 2)`);
    * block `b` (raster order) is the constant
    * `(doc_id·17 + b·29) mod 256`. */
  def jpegPayload(docId: Long): Array[Byte] = {
    val bw = (1 + docId % 3).toInt
    val bh = (1 + docId % 2).toInt
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); u8(0x00) // DQT, 8-bit, table 0
    (0 until 64).foreach(_ => u8(1)) // all-ones quantization
    marker(0xc0) // SOF0: baseline DCT
    u16(8 + 3); u8(8); u16(8 * bh); u16(8 * bw); u8(1) // 1 component
    u8(1); u8(0x11); u8(0) // id 1, 1x1 sampling, quant table 0
    def dht(clazz: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8(clazz << 4)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    marker(0xda) // SOS
    u16(6 + 2); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    // entropy-coded data: MSB-first bit writer with 0xFF byte stuffing
    var acc = 0; var nbits = 0
    def putBits(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    var prevDc = 0
    var b = 0
    val nBlocks = bw * bh
    while (b < nBlocks) {
      val v = ((docId * 17 + b * 29) % 256).toInt
      val dc = 8 * (v - 128) // exact DCT of a constant block, quant 1
      val diff = dc - prevDc
      prevDc = dc
      var cat = 0
      var mag = math.abs(diff)
      while (mag > 0) { cat += 1; mag >>= 1 }
      val (dcCode, dcLen) = dcCodes(cat)
      putBits(dcCode, dcLen)
      if (cat > 0)
        putBits(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
      val (eob, eobLen) = acCodes(0x00)
      putBits(eob, eobLen) // all ACs zero
      b += 1
    }
    if (nbits > 0) { // pad final byte with 1s, stuff if needed
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Decode a baseline grayscale JPEG from its bytes alone: marker
    * walk, quantization + Huffman tables read from the file's own
    * DQT/DHT segments (canonical code reconstruction), byte-unstuffed
    * entropy decode with DC prediction, dequantize, de-zigzag,
    * separable float IDCT, level shift + clamp. Handles any
    * single-component baseline stream, not only [[jpegPayload]]'s
    * DC-only profile. */
  def decodeJpeg(batch: Iterator[MediaRow]): Iterator[JpegFeatures] =
    batch.map { r =>
      val bytes = r.payload
      require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
      var pos = 2
      def u8(): Int = {
        require(pos < bytes.length, "truncated JPEG")
        val v = bytes(pos) & 0xff; pos += 1; v
      }
      def u16(): Int = { val v = u8(); (v << 8) | u8() }
      var w = 0; var h = 0
      val quant = new Array[Array[Int]](4)
      var compQuant = 0
      // decode tables: symbol lookup by (length, code)
      val huff = new Array[Map[(Int, Int), Int]](8) // [class*4 + id]
      var dcTable = 0; var acTable = 0
      var sosAt = -1
      while (sosAt < 0) {
        require(pos + 4 <= bytes.length, "truncated before SOS")
        require(u8() == 0xff, "marker expected")
        var m = u8()
        while (m == 0xff) m = u8() // fill bytes are legal
        val len = u16()
        val segEnd = pos + len - 2
        m match {
          case 0xdb => // DQT (possibly several tables)
            while (pos < segEnd) {
              val pqTq = u8()
              require((pqTq >> 4) == 0, "only 8-bit quant tables")
              require((pqTq & 0xf) < 4, s"quant table id ${pqTq & 0xf} > 3")
              quant(pqTq & 0xf) = Array.fill(64)(u8())
            }
          case 0xc4 => // DHT (possibly several tables)
            while (pos < segEnd) {
              val tcTh = u8()
              require((tcTh >> 4) <= 1 && (tcTh & 0xf) < 4,
                f"invalid DHT class/id byte $tcTh%02x")
              val bits = Array.fill(16)(u8())
              val vals = Array.fill(bits.sum)(u8())
              var code = 0; var k = 0
              val mb = Map.newBuilder[(Int, Int), Int]
              for (l <- 1 to 16) {
                var i = 0
                while (i < bits(l - 1)) {
                  mb += (l, code) -> vals(k); code += 1; k += 1; i += 1
                }
                code <<= 1
              }
              huff(((tcTh >> 4) << 2) | (tcTh & 0xf)) = mb.result()
            }
          case 0xc0 => // SOF0 baseline
            require(u8() == 8, "only 8-bit precision")
            h = u16(); w = u16()
            require(u8() == 1, "only single-component (grayscale)")
            u8() // component id
            require(u8() == 0x11, "only 1x1 sampling")
            compQuant = u8()
            require(compQuant < 4, s"quant table id $compQuant > 3")
          case 0xc1 | 0xc2 | 0xc3 =>
            sys.error("only baseline (SOF0) JPEG supported")
          case 0xda => // SOS
            u8() // 1 component (validated by SOF)
            u8() // component selector
            val tables = u8()
            dcTable = tables >> 4; acTable = tables & 0xf
            require(dcTable < 4 && acTable < 4,
              f"invalid SOS table selector byte $tables%02x")
            u8(); u8(); u8() // Ss/Se/AhAl (fixed for baseline)
            sosAt = pos
          case _ => pos = segEnd // APPn/COM/etc — skip
        }
        require(pos == segEnd || m == 0xda,
          f"segment overrun in marker ff$m%02x")
      }
      require(w > 0 && h > 0, "missing SOF before SOS")
      val q = quant(compQuant)
      require(q != null, "missing quantization table")
      val dcMap = huff(0 << 2 | dcTable)
      val acMap = huff(1 << 2 | acTable)
      require(dcMap != null && acMap != null, "missing Huffman tables")
      // entropy reader: MSB-first, 0xFF00 unstuffing, markers end data
      var acc = 0; var nbits = 0
      def bit(): Int = {
        if (nbits == 0) {
          require(pos < bytes.length, "truncated entropy stream")
          var b = bytes(pos) & 0xff; pos += 1
          if (b == 0xff) {
            require(pos < bytes.length, "truncated after 0xff")
            val nxt = bytes(pos) & 0xff
            require(nxt == 0x00, "marker inside entropy stream")
            pos += 1
          }
          acc = b; nbits = 8
        }
        nbits -= 1
        (acc >> nbits) & 1
      }
      def huffDecode(table: Map[(Int, Int), Int]): Int = {
        var code = 0; var len = 0
        while (len < 16) {
          code = (code << 1) | bit(); len += 1
          table.get((len, code)) match {
            case Some(v) => return v
            case None    => ()
          }
        }
        sys.error("invalid Huffman code")
      }
      def receive(s: Int): Int = {
        var v = 0; var i = 0
        while (i < s) { v = (v << 1) | bit(); i += 1 }
        if (s > 0 && v < (1 << (s - 1))) v - (1 << s) + 1 else v // extend
      }
      // precomputed IDCT basis
      val cosT = Array.tabulate(8, 8)((x, u) =>
        math.cos((2 * x + 1) * u * math.Pi / 16) *
          (if (u == 0) 1.0 / math.sqrt(2) else 1.0))
      val bw = (w + 7) / 8
      val bh = (h + 7) / 8
      var sum = 0L
      var prevDc = 0
      var b = 0
      while (b < bw * bh) {
        val zz = new Array[Int](64)
        val s = huffDecode(dcMap)
        prevDc += receive(s)
        zz(0) = prevDc * q(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = huffDecode(acMap)
          val run = rs >> 4; val size = rs & 0xf
          if (size == 0) {
            if (run == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += run
            require(k < 64, "AC coefficient index overrun")
            zz(k) = receive(size) * q(k)
            k += 1
          }
        }
        // de-zigzag + IDCT + accumulate (clip partial edge blocks)
        val coef = new Array[Int](64)
        var i = 0
        while (i < 64) { coef(Zigzag(i)) = zz(i); i += 1 }
        val bx = (b % bw) * 8; val by = (b / bw) * 8
        var y = 0
        while (y < 8 && by + y < h) {
          var x = 0
          while (x < 8 && bx + x < w) {
            var acc2 = 0.0
            var u = 0
            while (u < 8) {
              var v2 = 0
              while (v2 < 8) {
                val c = coef(v2 * 8 + u)
                if (c != 0) acc2 += c * cosT(x)(u) * cosT(y)(v2)
                v2 += 1
              }
              u += 1
            }
            val p = math.round(acc2 / 4.0 + 128.0).toInt
            sum += math.max(0, math.min(255, p))
            x += 1
          }
          y += 1
        }
        b += 1
      }
      JpegFeatures(r.doc_id, w.toLong, h.toLong, (w.toLong * h), sum)
    }

  /** Docs → real baseline JPEG bytes → table-driven entropy decode +
    * IDCT → exact luma sums. */
  def jpegFeatures(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, jpegPayload(id)))
      .mapPartitions(decodeJpeg).toDF()
  }
}
