package graft

import graft.text.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], maskBits: Int = 6) =
    Cdc.chunks(docs.toDF("doc_id", "text"), maskBits = maskBits)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2))

  private def mkText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("chunks tile each doc exactly: contiguous, full-cover, ordered") {
    val docs = Seq(1L -> mkText(1, 2000), 2L -> mkText(2, 700),
      3L -> "short", 4L -> "")
    val got = run(docs)
    assert(!got.exists(_._1 == 4L), "empty doc yields no chunks")
    for ((id, text) <- docs if text.nonEmpty) {
      val cs = got.filter(_._1 == id)
      assert(cs.head._3 === 0L)
      assert(cs.map(c => c._3 + c._4).max === text.length.toLong)
      cs.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 === a._3 + a._4, s"gap in doc $id")
        case _ =>
      }
    }
  }

  test("content-defined: a prefix insertion shifts offsets, not content") {
    val base = mkText(7, 3000)
    val shifted = "INSERTED-PREAMBLE-" * 3 + base
    val got = run(Seq(1L -> base, 2L -> shifted))
    val h1 = got.filter(_._1 == 1L).map(_._5)
    val h2 = got.filter(_._1 == 2L).map(_._5)
    // after the first resynchronizing cut, chunk contents realign:
    // most of doc 1's chunk hashes reappear in doc 2 despite the shift
    val shared = h1.toSet.intersect(h2.toSet)
    assert(shared.size >= h1.size - 2,
      s"CDC failed to realign: ${shared.size} of ${h1.size} chunks shared")
    // a FIXED-offset chunking of the same pair shares nothing
    val fixedShared = base.grouped(64).toSet
      .intersect(shifted.grouped(64).toSet)
    assert(fixedShared.isEmpty, "fixed chunking should not align (sanity)")
  }

  test("dupChunks finds a passage planted in many docs") {
    val passage = mkText(42, 600)
    val docs = (0L until 6L).map(i => i -> (mkText(100 + i.toInt, 300) + passage))
    val chunkTable = Cdc.chunks(docs.toDF("doc_id", "text"), maskBits = 6)
    val dups = Cdc.dupChunks(chunkTable)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4)))
    assert(dups.nonEmpty, "planted passage must produce duplicate chunks")
    val saved = dups.map(_._3).sum
    assert(saved > 5 * 200,
      s"expected substantial interior-chunk savings, got $saved")
    assert(dups.forall(_._2 <= 6), "copies bounded by doc count")
  }

  test("partitioning invariance and mask monotonicity") {
    val docs = (0L until 10L).map(i => i -> mkText(i.toInt, 1500))
    val a = run(docs)
    val b = Cdc.chunks(docs.toDF("doc_id", "text").repartition(7),
        maskBits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(t => (t._1, t._2))
    assert(a === b)
    // a stricter mask can only remove cut positions -> fewer chunks
    val coarse = Cdc.chunks(docs.toDF("doc_id", "text"), maskBits = 10)
      .count()
    assert(coarse <= a.length)
  }

  test("plan: chunking is map-only — no exchange before a consumer aggregates") {
    val df = (0L until 20L).map(i => (i, mkText(i.toInt, 800)))
      .toDF("doc_id", "text")
    val plan = Cdc.chunks(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
