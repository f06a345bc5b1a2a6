package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: opaque `binary` payloads with typed
 * metadata, decoded/feature-extracted in partition-local batches.
 *
 * IMAGE decode is REAL: payloads with an image-typed fmt go through the
 * JDK's own `javax.imageio` (PNG/JPEG/BMP/GIF ship with every JRE — no
 * new dependency), yielding true dimensions and a deterministic 8-float
 * feature (mean luminance over a 2x4 grid, integer-accumulated so it is
 * bit-stable across JVMs). Audio/video and unknown formats keep the
 * deterministic md5 STUB (this container has no codecs for them):
 * `stubDecode` derives fake dimensions and features from the payload's
 * md5. Either way the surrounding plumbing — schema, Encoders,
 * mapPartitions batch shape, partitioning, and the frame-sampling
 * explode — is the Spark shape a production FFI decoder slots into.
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

  /** Decode one batch: real ImageIO for image-typed payloads, md5 stub for
    * everything else. The fmt gate keeps non-image pipelines (e.g. the
    * text-payload bench path) off the reader-lookup cost entirely. */
  def decodeBatch(batch: Seq[MediaPayload]): Seq[Decoded] = batch.map { m =>
    (if (m.fmt != null && m.fmt.startsWith("image/")) decodeImage(m) else None)
      .getOrElse(stubDecode(m))
  }

  /** Shared image-path gate: fmt prefix + ImageIO parse; None for
    * non-images or undecodable bytes (both image consumers route
    * through this, so reader policy changes land once). */
  private def readImage(m: MediaPayload): Option[java.awt.image.BufferedImage] =
    if (m.fmt == null || !m.fmt.startsWith("image/")) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.payload)))
      catch { case _: Exception => None }

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF —
    * no extra dependency): true width/height plus an 8-float feature =
    * mean luminance (BT.601 integer weights, /1000 floor) of each cell
    * of a 2x4 grid, normalized to [0,1]. Integer accumulation + one IEEE
    * divide per cell keeps the vector bit-deterministic across JVMs.
    * Returns None for bytes ImageIO cannot parse (falls to the stub). */
  def decodeImage(m: MediaPayload): Option[Decoded] =
    try {
      readImage(m).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val lumSum = new Array[Long](8)
        val lumCnt = new Array[Long](8)
        var y = 0
        while (y < h) {
          val row = 4 * math.min(1, y * 2 / h)
          var x = 0
          while (x < w) {
            val px = img.getRGB(x, y)
            val lum = (((px >> 16) & 0xFF) * 299L + ((px >> 8) & 0xFF) * 587L +
              (px & 0xFF) * 114L) / 1000L
            val cell = row + math.min(3, x * 4 / w)
            lumSum(cell) += lum
            lumCnt(cell) += 1
            x += 1
          }
          y += 1
        }
        val feature = Array.tabulate(8)(i =>
          if (lumCnt(i) == 0L) 0.0f
          else (lumSum(i).toDouble / lumCnt(i) / 255.0).toFloat)
        Decoded(m.doc_id, m.fmt, m.payload.length.toLong, w, h, 1, feature)
      }
    } catch { case _: Exception => None }

  /** 64-bit average perceptual hash (aHash) of a decoded image: 8×8
    * cell luminance means, bit set iff the cell outshines the global
    * mean — the standard near-duplicate image fingerprint (small
    * Hamming distance ⇒ visually similar; pairs with the MinHash/LSH
    * text path for the multimodal dedup story). All-integer: BT.601
    * luminance, per-cell sums, and the mean comparison by
    * cross-multiplication `s_cell·C_total > S_total·c_cell` — no
    * division anywhere, so the hash is bit-stable across JVMs. */
  def aHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val s = new Array[Long](64)
    val c = new Array[Long](64)
    var y = 0
    while (y < h) {
      val row = math.min(7, y * 8 / h) * 8
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        val lum = ((px >> 16) & 0xFF) * 299L + ((px >> 8) & 0xFF) * 587L +
          (px & 0xFF) * 114L
        val cell = row + math.min(7, x * 8 / w)
        s(cell) += lum
        c(cell) += 1
        x += 1
      }
      y += 1
    }
    val sTot = BigInt(s.sum)
    val cTot = BigInt(c.sum)
    var bits = 0L
    var i = 0
    while (i < 64) {
      // BigInt cross-multiply: s(i)*cTot tops 2^63 above ~48 MP, and a
      // silent Long wrap would invert bits on exactly the large images
      if (c(i) > 0 && BigInt(s(i)) * cTot > sTot * c(i)) bits |= 1L << i
      i += 1
    }
    bits
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Perceptual hashes of the real-image payloads: (doc_id, ahash),
    * partition-local decode, rows ImageIO cannot parse are dropped. */
  def imageHashes(payloads: Dataset[MediaPayload]): Dataset[(Long, Long)] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap(m => readImage(m).map(img => (m.doc_id, aHash(img))))
  }

  /** STUB decode for formats the JDK lacks codecs for. Deterministic:
    * all outputs derive from the md5 of the payload bytes. */
  def stubDecode(m: MediaPayload): Decoded = {
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
