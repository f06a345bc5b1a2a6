package graft

import graft.core.Tables
import graft.media.Media
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfSmoke)

  test("decode stub: schema, determinism, partition invariance") {
    val d1 = Media.decode(Media.toPayloads(docs)).collect().sortBy(_.doc_id)
    val d2 = Media.decode(Media.toPayloads(docs.repartition(7)), batchSize = 3)
      .collect().sortBy(_.doc_id)
    assert(d1.length == docs.count())
    assert(d1.map(_.doc_id).toSeq == d2.map(_.doc_id).toSeq)
    assert(d1.zip(d2).forall { case (a, b) =>
      a.width == b.width && a.height == b.height && a.n_frames == b.n_frames &&
        a.feature.toSeq == b.feature.toSeq
    })
    assert(d1.forall(d => d.width >= 64 && d.height >= 64 && d.n_frames >= 1))
    assert(d1.forall(_.feature.length == 8))
    assert(d1.forall(_.feature.forall(f => f >= -1.0f && f <= 1.0f)))
  }

  test("decoded dims agree with the q_media_meta SQL-checked query") {
    val sqlSide = SparkEntry.queries("q_media_meta")(spark, sfSmoke)
      .select("doc_id", "width", "height", "n_frames").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val decoded = Media.decode(Media.toPayloads(docs)).collect()
    // Note: q_media_meta derives h8 from md5 hex chars, the stub from raw
    // md5 bytes — same first 4 bytes, so identical h8 and identical dims.
    decoded.foreach { d =>
      val (w, h, f) = (sqlSide(d.doc_id)._1, sqlSide(d.doc_id)._2, sqlSide(d.doc_id)._3)
      assert(d.width.toLong == w && d.height.toLong == h && d.n_frames.toLong == f,
        s"doc ${d.doc_id}: stub (${d.width},${d.height},${d.n_frames}) vs sql ($w,$h,$f)")
    }
  }

  test("real ImageIO decode: true dims, bit-deterministic luminance grid, stub fallback") {
    import spark.implicits._
    // deterministic 8x4 PNG: left half rgb(10,20,30), right rgb(200,100,50)
    val img = new java.awt.image.BufferedImage(
      8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y,
        if (x < 4) (10 << 16) | (20 << 8) | 30 else (200 << 16) | (100 << 8) | 50)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    // BT.601 integer luminance: left (10*299+20*587+30*114)/1000 = 18,
    // right (200*299+100*587+50*114)/1000 = 124; 2x4 grid -> cells
    // {0,1,4,5} left, {2,3,6,7} right
    val lo = (18.0 / 255.0).toFloat
    val hi = (124.0 / 255.0).toFloat
    val wantFeature = Seq(lo, lo, hi, hi, lo, lo, hi, hi)

    val payloads = Seq(
      Media.MediaPayload(1L, "image/png", png),
      Media.MediaPayload(2L, "image/png", "not a png".getBytes("UTF-8")),
      Media.MediaPayload(3L, "video/mp4", png)) // fmt gate: no image path
    val d = Media.decode(payloads.toDS()).collect().sortBy(_.doc_id)

    assert(d(0).width == 8 && d(0).height == 4 && d(0).n_frames == 1)
    assert(d(0).n_bytes == png.length.toLong)
    assert(d(0).feature.toSeq == wantFeature)
    // decode is bit-deterministic run-to-run
    val again = Media.decodeBatch(payloads).head
    assert(again.feature.toSeq == wantFeature && again.width == 8)
    // unparseable image bytes and non-image fmts fall to the md5 stub
    def flat(x: Media.Decoded) =
      (x.doc_id, x.fmt, x.n_bytes, x.width, x.height, x.n_frames, x.feature.toSeq)
    assert(flat(d(1)) == flat(Media.stubDecode(payloads(1))))
    assert(flat(d(2)) == flat(Media.stubDecode(payloads(2))))
  }

  test("frame sampling and resize") {
    val dec = Media.decode(Media.toPayloads(docs))
    val frames = Media.sampleFrames(dec, stride = 5).collect()
    val byDoc = frames.groupBy(_.doc_id)
    dec.collect().foreach { d =>
      assert(byDoc(d.doc_id).length == (d.n_frames + 4) / 5)
    }
    val resized = Media.resize(dec, 128).collect()
    assert(resized.forall(d => d.width <= 128 && d.height <= 128))
  }

  test("aHash: near-duplicate images land close, distinct far, stub rows dropped") {
    import spark.implicits._
    def png(f: (Int, Int) => Int, w: Int = 64, h: Int = 64): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def gradient(b: Int)(x: Int, y: Int): Int = {
      val v = math.min(255, (x * 255 / 63 + b))
      (v << 16) | (v << 8) | v
    }
    def checker(x: Int, y: Int): Int =
      if (((x / 8) + (y / 8)) % 2 == 0) 0xFFFFFF else 0
    val payloads = Seq(
      Media.MediaPayload(1L, "image/png", png(gradient(0))),
      Media.MediaPayload(2L, "image/png", png(gradient(6))),  // brightened
      Media.MediaPayload(3L, "image/png", png(checker)),
      Media.MediaPayload(4L, "image/png", "garbage".getBytes("UTF-8")),
      Media.MediaPayload(5L, "video/mp4", png(checker))).toDS()
    val h = Media.imageHashes(payloads).collect().toMap
    assert(h.keySet === Set(1L, 2L, 3L), "undecodable/non-image dropped")
    assert(Media.hamming(h(1L), h(2L)) <= 8,
      s"brightened twin too far: ${Media.hamming(h(1L), h(2L))}")
    assert(Media.hamming(h(1L), h(3L)) >= 16,
      s"distinct images too close: ${Media.hamming(h(1L), h(3L))}")
    // deterministic across runs
    assert(Media.imageHashes(payloads).collect().toMap === h)
  }

  test("aHash: 54-megapixel image exceeds the Long cross-multiply range") {
    // 9000x6000, left half white / right half black: a white cell's
    // s(cell)*C_total ~ 1.2e19 > 2^63, so Long cross-multiplication
    // would wrap negative and CLEAR exactly the bits that must be set.
    // Expected hash: in every 8x8 grid row the 4 left (white) cells
    // outshine the mean, the 4 right do not -> 0x0F0F0F0F0F0F0F0F.
    val w = 9000
    val h = 6000
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < h) {
      java.util.Arrays.fill(buf, y * w, y * w + w / 2, 0xFF.toByte)
      y += 1
    }
    assert(Media.aHash(img) === 0x0F0F0F0F0F0F0F0FL)
  }
}
