package graft

import graft.text.DupSpans
import org.apache.spark.sql.functions._

/** [[DupSpans]] vs a driver-side brute force (window hashing + interval
  * merge over plain Scala collections) and hand fixtures pinning the
  * merge boundary cases. */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def bruteSpans(corpus: Seq[(Long, String)], k: Int)
  : Set[(Long, Long, Long, Long)] = {
    val wins = corpus.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      (0 to toks.length - k).map(p => (id, p, toks.slice(p, p + k).mkString(" ")))
    }
    val freq = wins.groupBy(_._3).view.mapValues(_.size).toMap
    wins.filter(w => freq(w._3) > 1).groupBy(_._1).flatMap { case (id, ws) =>
      val ps = ws.map(_._2).sorted
      // fold sorted positions into maximal merged [start, end] spans
      val islands = ps.foldLeft(List.empty[(Int, Int, Int)]) {
        case (acc, p) => acc match {
          case (s, e, n) :: rest if p <= e + 1 =>
            (s, math.max(e, p + k - 1), n + 1) :: rest
          case _ => (p, p + k - 1, 1) :: acc
        }
      }
      islands.map { case (s, e, n) => (id, s.toLong, e.toLong, n.toLong) }
    }.toSet
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet

  test("planted cross-doc phrase: exact spans, non-dup docs silent") {
    // docs 1 and 2 share the 6-token phrase at different offsets; doc 3
    // is fully unique; doc 4 is shorter than k and must emit nothing
    val docs = Seq(
      (1L, "u1 u2 p1 p2 p3 p4 p5 p6 u3 u4"),
      (2L, "w1 p1 p2 p3 p4 p5 p6"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8"),
      (4L, "y1 y2 y3")).toDF("doc_id", "text")
    val got = collect(DupSpans.spans(docs, k = 5))
    // 6-token shared phrase => two 5-windows per doc, merged into one span
    assert(got == Set((1L, 2L, 7L, 2L), (2L, 1L, 6L, 2L)))
  }

  test("merge boundary: adjacent spans merge, gap-of-one spans do not") {
    // "a b" x3 makes every 2-window of the run duplicated; craft two
    // docs where the duplicated runs sit at controlled distances
    val phrase = "c1 c2" // k=2 window duplicated across docs
    val adjacent = s"$phrase $phrase z1"          // windows at 0 and 2: 2 <= (0+1)+1 -> merge
    val gapped = s"$phrase g1 g2 g3 $phrase"      // windows at 0 and 5: separate spans
    val docs = Seq((1L, adjacent), (2L, gapped), (3L, phrase))
      .toDF("doc_id", "text")
    val got = collect(DupSpans.spans(docs, k = 2))
    assert(got == bruteSpans(Seq((1L, adjacent), (2L, gapped), (3L, phrase)), 2))
    // the adjacent doc merged into ONE span, the gapped doc into TWO
    assert(got.count(_._1 == 1L) == 1 && got.count(_._1 == 2L) == 2)
  }

  test("sf0.001 == brute force, invariant under partitioning") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "text")
    val corpus = docs.as[(Long, String)].collect().toSeq
    val expected = bruteSpans(corpus, k = 5)
    assert(collect(DupSpans.spans(docs, k = 5)) == expected)
    assert(collect(DupSpans.spans(docs.repartition(13, col("text")), k = 5))
      == expected)
  }

  test("spansHashed == spans on a collision-free corpus, any partitioning") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "text")
    val expected = collect(DupSpans.spans(docs, k = 5))
    assert(collect(DupSpans.spansHashed(docs, k = 5)) == expected)
    assert(collect(DupSpans.spansHashed(docs.repartition(7), k = 5))
      == expected)
  }

  test("excise: drops exactly the span tokens, pass-through and full-dup") {
    // doc 1/2 share a 6-token phrase; doc 3 untouched; doc 4 is a full
    // duplicate of doc 5 (every token in a span -> empty clean_text)
    val docs = Seq(
      (1L, "u1 u2 p1 p2 p3 p4 p5 p6 u3 u4"),
      (2L, "w1 p1 p2 p3 p4 p5 p6"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8"),
      (4L, "d1 d2 d3 d4 d5 d6"),
      (5L, "d1 d2 d3 d4 d5 d6")).toDF("doc_id", "text")
    val got = DupSpans.excise(docs, k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (1L, "u1 u2 u3 u4", 4L, 6L),
      (2L, "w1", 1L, 6L),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8", 8L, 0L),
      (4L, "", 0L, 6L),
      (5L, "", 0L, 6L)))
  }

  test("excise == brute force at sf0.001") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "text")
    val corpus = docs.as[(Long, String)].collect().toSeq
    val spans = bruteSpans(corpus, k = 5)
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3))).toMap
    val expected = corpus.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val drop = spans.getOrElse(id, Set.empty)
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !drop.exists(s => i >= s._1 && i <= s._2) => t
      }
      (id, kept.mkString(" "), kept.length.toLong,
        (toks.length - kept.length).toLong)
    }.toSet
    val got = DupSpans.excise(docs, k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expected)
  }

  test("coverage: zero-dup docs report 0 spans and dup_frac 0.0") {
    val docs = Seq(
      (1L, "p1 p2 p3 p4 p5"),
      (2L, "p1 p2 p3 p4 p5 extra"),
      (3L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text")
    val got = DupSpans.coverage(docs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == Set(
      (1L, 5L, 5L, 1L, 1.0),
      (2L, 6L, 5L, 1L, 5.0 / 6.0),
      (3L, 5L, 0L, 0L, 0.0)))
  }
}
