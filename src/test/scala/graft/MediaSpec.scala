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
}
