package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction as a partition-local typed pass.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (payload slicing); everything
  * around it — the schema (binary + metadata struct), the
  * `mapPartitions` batch shape, and the feature columns — is the real
  * Spark-side plumbing a decode UDF would plug into.
  *
  * Scale: the typed pass is partition-local (no shuffle); a real decoder
  * would batch per-partition exactly like this, and the binary column
  * stays columnar-compressed in parquet until projected.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, n_frames: Long, frame0: Array[Byte],
                           thumb: Array[Byte])

  /** Attach a binary payload + metadata struct to the documents table.
    * (Testdata has no binary column; the text bytes stand in for an
    * opaque media blob.) */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("fake/utf8").as("format"),
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("source").as("origin")).as("media_meta"))

  /** STUB decoder: a real implementation would decode the codec here.
    * Deterministic fake: "frames" are fixed-size byte windows. */
  private def decodeStub(payload: Array[Byte], frameSize: Int): Seq[Array[Byte]] =
    if (payload.isEmpty) Seq.empty
    else payload.grouped(frameSize).toSeq

  /** STUB resize: a real implementation would rescale pixels; the fake
    * strided-subsample keeps the shape contract (fixed output size,
    * deterministic) a resize kernel would satisfy. */
  private def resizeStub(payload: Array[Byte], outBytes: Int): Array[Byte] =
    if (payload.isEmpty) Array.emptyByteArray
    else {
      val stride = math.max(1, payload.length / outBytes)
      payload.indices.by(stride).take(outBytes).map(payload).toArray
    }

  /** Frame-sample features via a partition-local typed pass
    * (the `mapPartitions` batch shape a real decoder needs). */
  def extractFeatures(media: DataFrame, frameSize: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = media.select(
      col("doc_id"),
      col("payload"),
      col("media_meta.format").as("format"),
      col("media_meta.n_bytes").cast("long").as("n_bytes")).as[MediaRow]
    typed.mapPartitions { rows =>
      rows.map { r =>
        val frames = decodeStub(r.payload, frameSize)
        MediaFeatures(r.doc_id, r.n_bytes, frames.length.toLong,
          frames.headOption.getOrElse(Array.emptyByteArray),
          resizeStub(r.payload, 8))
      }
    }.toDF()
  }
}
