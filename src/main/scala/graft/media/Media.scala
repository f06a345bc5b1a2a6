package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: opaque `binary` payloads with typed
 * metadata, decoded/feature-extracted in partition-local batches.
 *
 * The actual image/audio decode is STUBBED (this container has no media
 * libraries): `decodeBatch` derives deterministic fake dimensions and an
 * 8-float feature vector from the payload's md5. Everything around the
 * stub — schema, Encoders, mapPartitions batch shape, partitioning, and
 * the frame-sampling explode — is the real Spark plumbing a production
 * decode would slot into (swap `decodeBatch` for a JNI/FFI call over the
 * same Iterator[Batch] shape).
 */
object Media {

  final case class MediaPayload(doc_id: Long, fmt: String, payload: Array[Byte])
  final case class Decoded(
      doc_id: Long, fmt: String, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, feature: Array[Float])
  final case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int)

  /** Wrap a text table into binary payload rows (payload = UTF-8 bytes). */
  def toPayloads(docs: DataFrame): Dataset[MediaPayload] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        lit("fake/v1").as("fmt"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaPayload]
  }

  /** STUB decode of one batch. Deterministic: all outputs derive from the
    * md5 of the payload bytes. Replace with the real vectorized decoder. */
  def decodeBatch(batch: Seq[MediaPayload]): Seq[Decoded] = batch.map { m =>
    val md = java.security.MessageDigest.getInstance("MD5").digest(m.payload)
    def u(i: Int): Long = md(i).toLong & 0xFFL
    val h8 = (u(0) << 24) | (u(1) << 16) | (u(2) << 8) | u(3)
    val feature = Array.tabulate(8)(i => ((u(2 * i) << 8 | u(2 * i + 1)).toFloat
      / 65535.0f) * 2.0f - 1.0f)
    Decoded(m.doc_id, m.fmt, m.payload.length.toLong,
      (64L + h8 % 1856L).toInt, (64L + (h8 * 31L) % 1016L).toInt,
      (1L + h8 % 30L).toInt, feature)
  }

  /** Partition-local batched decode: groups rows into fixed-size batches
    * (the shape a vectorized/FFI decoder wants), no shuffle. */
  def decode(payloads: Dataset[MediaPayload], batchSize: Int = 64): Dataset[Decoded] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions(it => it.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Frame sampling: one row per kept frame (every `stride`-th). A pure
    * generator — stays narrow, no shuffle. */
  def sampleFrames(decoded: Dataset[Decoded], stride: Int = 5): Dataset[Frame] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.flatMap(d =>
      (0 until d.n_frames by stride).map(i => Frame(d.doc_id, i, d.width, d.height)))
  }

  /** "Resize": deterministic metadata transform keeping aspect ratio. */
  def resize(decoded: Dataset[Decoded], maxSide: Int): Dataset[Decoded] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { d =>
      val s = math.min(1.0, maxSide.toDouble / math.max(d.width, d.height))
      d.copy(width = math.max(1, math.floor(d.width * s).toInt),
        height = math.max(1, math.floor(d.height * s).toInt))
    }
  }

  /** End-to-end stub pipeline used by tests and the bench. */
  def pipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    val dec = decode(toPayloads(docs))
    sampleFrames(dec).groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"), max("width").as("width"))
  }
}
