package graft

import graft.text.LangModel
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq((0L, "a b a b c"), (1L, "a b"), (2L, "x"), (3L, "c c c"))
      .toDF("doc_id", "text")
  }

  test("selfScore matches hand-computed add-one fixed-point rarity") {
    // bigrams: doc0 (a,b)(b,a)(a,b)(b,c); doc1 (a,b); doc3 (c,c)x2
    // uni: a=3 b=2 c=2, V=3; bi: (a,b)=3 (b,a)=1 (b,c)=1 (c,c)=2
    // r(a,b) = (3+3)*2^20 div 4 = 1572864
    // r(b,a) = r(b,c) = (2+3)*2^20 div 2 = 2621440
    // r(c,c) = (2+3)*2^20 div 3 = 1747626
    val got = LangModel.selfScore(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(0L, 1L, 3L)) // doc 2 has < 2 tokens: no row
    assert(got(0L) == ((4L, 2L * 1572864L + 2L * 2621440L,
      (2.0 * 1572864 + 2 * 2621440) / 4.0)))
    assert(got(1L) == ((1L, 1572864L, 1572864.0)))
    assert(got(3L) == ((2L, 2L * 1747626L, 1747626.0)))
  }

  test("pruned model: kept entries score exactly, pruned hit the floor") {
    // maxVocab=1 keeps top unigram (c1 desc, w1) = ('a', 3) and top
    // bigram = (('a','b'), 3); V stays the UNPRUNED 3.
    import spark.implicits._
    val (uni, bi, v) = LangModel.train(corpus, maxVocab = 1)
    assert(v == 3L)
    assert(uni.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("a", 3L)))
    val probes = Seq((10L, "a b"), (11L, "c c")).toDF("doc_id", "text")
    val got = LangModel.score(probes, uni, bi, v, broadcastModel = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // kept path: identical to the exact model's r(a,b)
    assert(got(10L) == 1572864L)
    // floor path: (c,c) pruned away -> c1=0, c12=0 -> (0+3)*2^20 div 1
    assert(got(11L) == 3L * LangModel.Scale)
  }

  test("broadcast scoring plan: model joins are broadcast, no sort-merge") {
    val (uni, bi, v) = LangModel.train(corpus, maxVocab = 100)
    val plan = LangModel.score(corpus, uni, bi, v, broadcastModel = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("hot-key split scores identically to the naive equi-join") {
    val (uni, bi, v) = LangModel.train(corpus)
    def rows(hot: Long) =
      LangModel.score(corpus, uni, bi, v, hotCount = hot)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    // hotCount=1 routes nearly every key through the broadcast branch;
    // hotCount=MaxValue is the pure equi-join
    assert(rows(1L) == rows(Long.MaxValue))
  }

  test("scoring against a foreign reference model: unseen-left floor") {
    import spark.implicits._
    val ref = Seq((0L, "p q p q")).toDF("doc_id", "text") // uni p=2 q=1, V=2
    val (uni, bi, v) = LangModel.train(ref)
    val got = LangModel.score(Seq((5L, "p q z z")).toDF("doc_id", "text"),
        uni, bi, v)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    // (p,q): c1=2 c12=2 -> (2+2)*2^20 div 3 = 1398101
    // (q,z): c1=1 c12=0 -> (1+2)*2^20 div 1 = 3145728
    // (z,z): c1=0 c12=0 -> (0+2)*2^20 div 1 = 2097152
    assert(got == ((3L, 1398101L + 3145728L + 2097152L)))
  }
}
