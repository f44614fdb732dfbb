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
