package graft

import graft.text.InvertedIndex
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c a b c"),
    (2L, "a a a b"),
    (3L, "b c"),
    (4L, "c a b a")).toDF("doc_id", "text")

  private lazy val idx = InvertedIndex.postings(docs)

  /** Scalar reference phrase matcher. */
  private def refSearch(phrase: Seq[String]): Map[Long, Seq[Int]] =
    Seq((1L, "a b c a b c"), (2L, "a a a b"), (3L, "b c"), (4L, "c a b a"))
      .map { case (id, t) =>
        val toks = t.split(" ")
        id -> (0 to toks.length - phrase.length).collect {
          case i if toks.slice(i, i + phrase.length).sameElements(phrase) =>
            i + 1
        }.toSeq
      }.filter(_._2.nonEmpty).toMap

  private def run(phrase: Seq[String]): Map[Long, Seq[Int]] =
    InvertedIndex.phraseSearch(idx, phrase).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

  test("postings carry every occurrence, 1-based and sorted") {
    val got = idx.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Int](2)).toMap
    assert(got(("a", 1L)) == Seq(1, 4))
    assert(got(("a", 2L)) == Seq(1, 2, 3))
    assert(got(("c", 3L)) == Seq(2))
    assert(got.keys.count(_._1 == "b") == 4)
  }

  test("bigram and trigram phrase matches equal the scalar matcher") {
    for (p <- Seq(Seq("a", "b"), Seq("b", "c"), Seq("a", "b", "c"),
        Seq("c", "a", "b"))) {
      assert(run(p) == refSearch(p), s"phrase $p")
    }
  }

  test("repeated-term phrase overlaps correctly") {
    // "a a" in doc 2 ("a a a b") matches at 1 AND 2 (overlapping)
    assert(run(Seq("a", "a")) == Map(2L -> Seq(1, 2)))
    assert(run(Seq("a", "a", "a")) == Map(2L -> Seq(1)))
  }

  test("single-term phrase is the posting list itself") {
    assert(run(Seq("c")) == refSearch(Seq("c")))
  }

  test("absent phrase returns no rows") {
    assert(run(Seq("b", "a", "c")).isEmpty)
    assert(run(Seq("z")).isEmpty)
  }
}
