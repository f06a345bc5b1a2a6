package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  // ---- scalar reference trainer (plain collections) ----

  private def refApply(syms: Vector[String], a: String,
                       b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(words: Map[String, Long],
                       n: Int): Seq[(Int, String, String, Long)] = {
    var v = words.toSeq.map { case (w, f) =>
      (w.map(_.toString).toVector, f)
    }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var k = 1
    var stop = false
    while (k <= n && !stop) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- v; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += ((k, a, b, c))
        v = v.map { case (syms, f) => (refApply(syms, a, b), f) }
        k += 1
      }
    }
    out.result()
  }

  private def wordFreqs(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def gotMerges(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  // Adversarial corpus: odd same-symbol runs (greedy "aaaaa" ->
  // [aa,aa,a]), alternating pairs sharing boundaries ("ababab"),
  // and a chained multi-char merge ladder (t+h, then th+e).
  private val adversarial = Seq(
    "the the the then there aaaaa ababab",
    "the them aaaaa aaa aa ababab abab",
    "x aaaaa the the")

  test("trainMerges matches the scalar reference on adversarial runs") {
    val got = gotMerges(Bpe.trainMerges(docsDf(adversarial), 8))
    val want = refTrain(wordFreqs(adversarial), 8)
    assert(got == want)
    // the ladder actually chained: some learned pair has a multi-char side
    assert(got.exists { case (_, a, b, _) => a.length + b.length > 2 })
  }

  test("applyMerge column == scalar greedy on same-symbol runs") {
    import spark.implicits._
    val cases = Seq(
      Vector("a", "a", "a", "a", "a"),
      Vector("a", "a", "a"),
      Vector("a", "b", "a", "b"),
      Vector("x", "a", "a", "a", "y"),
      Vector("th", "e", "th", "th"),
      Vector("b"),
      Vector.empty[String])
    val df = cases.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("id", "syms")
    for ((a, b) <- Seq(("a", "a"), ("a", "b"), ("th", "th"), ("th", "e"))) {
      val got = df.withColumn("m", Bpe.applyMerge(col("syms"), a, b))
        .orderBy("id").collect()
        .map(_.getSeq[String](2).toVector).toSeq
      assert(got == cases.map(refApply(_, a, b)),
        s"merge ($a,$b) diverged from scalar greedy")
    }
  }

  test("trainMerges is invariant under input partitioning") {
    val base = gotMerges(Bpe.trainMerges(docsDf(adversarial), 5))
    val got = gotMerges(Bpe.trainMerges(docsDf(adversarial)
      .repartition(7), 5))
    assert(got == base)
  }

  test("pair-exhausted corpus stops early; single-char words train nothing") {
    assert(Bpe.trainMerges(docsDf(Seq("a b c", "d e")), 4).count() == 0L)
    val two = gotMerges(Bpe.trainMerges(docsDf(Seq("ab ab ba")), 10))
    // pairs: (a,b) freq 2, (b,a) freq 1 -> merge ab; then ba -> merge ba;
    // then nothing remains.
    assert(two == Seq((1, "a", "b", 2L), (2, "b", "a", 1L)))
  }

  test("encode applies learned merges in rank order, map-only") {
    val docs = docsDf(adversarial)
    val merges = gotMerges(Bpe.trainMerges(docs, 6))
      .map { case (_, a, b, _) => (a, b) }
    val got = Bpe.encode(docs, merges).orderBy("doc_id").collect()
      .map(r => (r.getSeq[String](2).toVector, r.getLong(3)))
    val want = adversarial.map { t =>
      val toks = t.split(" ", -1).filter(_.nonEmpty)
      val enc = toks.toVector.flatMap { w =>
        merges.foldLeft(w.map(_.toString).toVector) {
          case (syms, (a, b)) => refApply(syms, a, b)
        }
      }
      (enc, enc.size.toLong)
    }
    assert(got.toSeq == want)
    // map-only: encoding adds no exchange over the scan
    val plan = Bpe.encode(docs, merges).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode plan shuffles:\n$plan")
  }
}
