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
  * The decode step itself is a STUB — media codecs are not available in
  * this environment — implemented as a deterministic byte-level fake so
  * the plumbing (binary column, partition batching, feature schema,
  * join-back) is real and testable end-to-end. Swap `stubDecode` for a
  * JNI/ONNX call in production; nothing else changes.
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
}
