package graft

import graft.text.{Sampling, Tfidf}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Tfidf]] vs a driver-side brute force; [[Sampling.stratifiedExact]]
  * two-phase plan vs the naive single-window plan it must equal. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf top terms == brute force on a hand fixture") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana durian"),
      (3L, "apple cherry cherry cherry durian"),
      (4L, "elderberry")).toDF("doc_id", "text")
    val got = Tfidf.topTerms(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet

    // brute force
    val corpus = Seq(
      1L -> Seq("apple", "banana", "apple", "cherry"),
      2L -> Seq("banana", "banana", "durian"),
      3L -> Seq("apple", "cherry", "cherry", "cherry", "durian"),
      4L -> Seq("elderberry"))
    val tf = corpus.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (d, t, xs.size.toLong) }
    }
    val df_ = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val expected = tf.groupBy(_._1).flatMap { case (d, rows) =>
      rows.map { case (_, t, f) => (t, f, df_(t)) }
        .sortBy { case (t, f, dfv) => (-f.toDouble / dfv, t) }
        .take(2).zipWithIndex
        .map { case ((t, f, dfv), i) => (d, t, f, dfv, i + 1) }
    }.toSet
    assert(got == expected)
  }

  test("tfidf hot-term broadcast split == naive join on a 90%-stopword corpus") {
    // 9 of every 10 tokens are the stopword "the": a hot join key by
    // construction (df = every doc)
    val docs = (0 until 200).map { i =>
      (i.toLong, (Seq.fill(9)("the") :+ s"term$i").mkString(" "))
    }.toDF("doc_id", "text")
    def rows(hotDf: Long) = Tfidf.topTerms(docs, k = 2, hotDf = hotDf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    val split = rows(hotDf = 50L)            // "the" (df=200) -> broadcast branch
    val plain = rows(hotDf = Long.MaxValue)  // all terms cold: the naive join
    assert(split == plain)
    // per doc: rare term wins (1/1), "the" is rank 2 (9/200)
    assert(split.count(_._2 == "the") == 200)
    assert(split.count(t => t._2 == s"term${t._1}" && t._5 == 1) == 200)
    // the hot branch resolves map-side: a broadcast join is in the plan
    val plan = Tfidf.topTerms(docs, k = 2, hotDf = 50L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("shingle commonness == brute force on a hand fixture") {
    val docs = Seq(
      (1L, "the quick brown fox"), // shingles: "the quick brown", "quick brown fox"
      (2L, "the quick brown dog"), // shares "the quick brown" with 1
      (3L, "lorem ipsum"), // < 3 tokens: no row
      (4L, "the quick brown fox")) // identical to 1
      .toDF("doc_id", "text")
    val got = graft.text.Tfidf.shingleCommonness(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // df("the quick brown") = 3 (docs 1,2,4); df("quick brown fox") = 2
    // (docs 1,4); df("quick brown dog") = 1 (doc 2)
    assert(got == Map(
      1L -> ((2L, 5L, 2.5)),
      2L -> ((2L, 4L, 2.0)),
      4L -> ((2L, 5L, 2.5))))
  }

  test("tfidf rank is dense per doc and bounded by k") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val out = Tfidf.topTerms(docs, k = 3)
    val bad = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
      .filter(col("n") > 3 || col("mx") > 3 || col("mn") =!= 1)
    assert(bad.isEmpty)
  }

  private def naive(df: org.apache.spark.sql.DataFrame,
                    quota: org.apache.spark.sql.Column) = {
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= quota)
      .select("doc_id", "lang", "rk")
  }

  test("stratified two-phase == naive window at every threshold regime") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "lang")
    val quota = when(col("lang") === "en", 12).otherwise(5)
    val expected = naive(docs, quota).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // 1: every stratum deficient (pure fallback); 2048: mixed; 65536:
    // prefilter disabled (pure single-phase)
    for (t <- Seq(1, 2048, 65536)) {
      val got = Sampling.stratifiedExact(docs, "lang", "doc_id", quota, t)
        .select("doc_id", "lang", "rk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(got == expected, s"threshold $t")
    }
  }

  test("stratified sample: NULL stratum is a real group, unchanged by other strata's deficiency") {
    // NULL-lang docs (a real group for groupBy AND the rank window) plus
    // a deliberately deficient tiny stratum: NULL's picks must be the
    // same whether or not the fallback branch fires
    val docs = (0 until 60).map { i =>
      val lang = if (i < 40) null else if (i < 58) "en" else "xx"
      (i.toLong, lang)
    }.toDF("doc_id", "lang")
    val quota = lit(5)
    def picks(threshold: Int) =
      Sampling.stratifiedExact(docs, "lang", "doc_id", quota, threshold)
        .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2)))
        .toSet
    // threshold 65536: nothing deficient (single-phase reference)
    val ref = picks(65536)
    assert(ref.count(_._2.isEmpty) == 5, "NULL stratum quota met")
    assert(ref.count(_._2.contains("xx")) == 2, "tiny stratum fully kept")
    // small thresholds: some strata go deficient; the NULL group must
    // survive the split with identical picks
    for (t <- Seq(1, 512, 4096)) assert(picks(t) == ref, s"threshold $t")
  }

  test("stratified sample: exact quota met when stratum is large enough") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "lang")
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val quota = lit(3)
    val got = Sampling.stratifiedExact(docs, "lang", "doc_id", quota, 65536)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((l, n) <- strata) assert(got.getOrElse(l, 0L) == math.min(3L, n))
  }

  test("prefix sum: two-level scan == naive global window, any bucketing") {
    val rows = (0 until 500).map(i => ((i * 37L) % 1000, (i % 13 + 1).toLong))
    val df = rows.toDF("k", "n")
    val expected = rows.sortBy(_._1).scanLeft((0L, 0L)) {
      case ((_, acc), (k, n)) => (k, acc + n)
    }.sliding(2).map { case Seq((_, acc), (k, _)) => k -> acc }.toMap
    for (shift <- Seq(0, 4, 10, 63); parts <- Seq(1, 7)) {
      val got = graft.core.PrefixSum.exclusive(
          df.repartition(parts), "k", "n", shiftrightunsigned(col("k"), shift))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expected, s"shift=$shift parts=$parts")
    }
  }

  test("packing: contiguous offsets, exact chunk spans, oversized docs span") {
    val docs = Seq(
      (10L, Seq.fill(100)("w").mkString(" ")),   // 100 tokens
      (11L, Seq.fill(600)("w").mkString(" ")),   // 600: spans 2 chunks
      (12L, "a b c"),                            // 3
      (13L, Seq.fill(1200)("w").mkString(" ")))  // 1200: spans 3+
      .toDF("doc_id", "text")
    val got = graft.text.Packing.concatChunk(docs, capacity = 512L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (10L, 100L, 0L, 0L, 0L),
      (11L, 600L, 100L, 0L, 1L),
      (12L, 3L, 700L, 1L, 1L),
      (13L, 1200L, 703L, 1L, 3L)))
  }

  test("packing: doc ending exactly on a chunk boundary does not bleed over") {
    val docs = Seq(
      (20L, Seq.fill(512)("w").mkString(" ")), // fills chunk 0 exactly
      (21L, "x"),                              // first token of chunk 1
      (22L, Seq.fill(512)("w").mkString(" "))) // 513..1024: chunks 1-2
      .toDF("doc_id", "text")
    val got = graft.text.Packing.concatChunk(docs, capacity = 512L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (20L, 0L, 0L, 0L),
      (21L, 512L, 1L, 1L),
      (22L, 513L, 1L, 2L)))
  }

  test("packing: emitted slices — 3-chunk doc, mid-chunk splits, provenance exact") {
    val docs = Seq(
      (10L, Seq.fill(100)("w").mkString(" ")),   // 100 tokens
      (11L, Seq.fill(600)("w").mkString(" ")),   // 600: split across 0/1
      (12L, "a b c"),                            // 3
      (13L, Seq.fill(1200)("w").mkString(" ")))  // 1200: spans chunks 1-3
      .toDF("doc_id", "text")
    val got = graft.text.Packing.chunkSlices(docs, capacity = 512L)
      .orderBy("chunk_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      // (chunk_id, doc_id, tok_start, tok_len, seq_off)
      (0L, 10L, 0L, 100L, 0L),
      (0L, 11L, 0L, 412L, 100L),
      (1L, 11L, 412L, 188L, 0L),
      (1L, 12L, 0L, 3L, 188L),
      (1L, 13L, 0L, 321L, 191L),
      (2L, 13L, 321L, 512L, 0L),
      (3L, 13L, 833L, 367L, 0L)))
    // assembled form: every chunk full except the last; slices cover each
    // chunk contiguously from seq_off 0
    val chunks = graft.text.Packing.emitChunks(docs, capacity = 512L)
      .orderBy("chunk_id").collect()
    assert(chunks.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((0L, 512L), (1L, 512L), (2L, 512L), (3L, 367L)))
    chunks.foreach { r =>
      val slices = r.getSeq[org.apache.spark.sql.Row](1)
      var pos = 0L
      slices.foreach { s =>
        assert(s.getLong(0) == pos, s"chunk ${r.getLong(0)} gap at $pos")
        pos += s.getLong(3)
      }
    }
  }

  test("packing: emitted slices — exact-fit doc produces exactly one full slice") {
    val docs = Seq(
      (20L, Seq.fill(512)("w").mkString(" ")), // fills chunk 0 exactly
      (21L, "x"),
      (22L, Seq.fill(512)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.text.Packing.chunkSlices(docs, capacity = 512L)
      .orderBy("chunk_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 20L, 0L, 512L, 0L),   // no bleed into chunk 1
      (1L, 21L, 0L, 1L, 0L),
      (1L, 22L, 0L, 511L, 1L),
      (2L, 22L, 511L, 1L, 0L)))
  }

  test("stratified sample is independent of partitioning") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "lang")
    val quota = lit(7)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedExact(df, "lang", "doc_id", quota, 2048)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(docs.repartition(17)) == ids(docs.coalesce(1)))
  }

  test("token budget: two-phase == naive window at every threshold regime, first crossing included") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val budget = when(col("lang") === "en", 9000L).otherwise(4000L)
    def ids(threshold: Int) =
      Sampling.tokenBudget(docs, "lang", "doc_id", "n_chars", budget, threshold)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // naive single-window reference
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("cum", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .filter(col("cum") < budget)
    val naiveIds = naive.select("doc_id").collect().map(_.getLong(0)).toSet
    for (t <- Seq(64, 2048, 65536)) assert(ids(t) == naiveIds, s"threshold $t")
    // first-crossing semantics: each sampled stratum's token total
    // reaches its budget unless the whole stratum was consumed
    val perLang = naive.groupBy("lang")
      .agg(sum(col("n_chars")).as("got"), count(lit(1)).as("k"))
      .join(docs.groupBy("lang").agg(count(lit(1)).as("n")), "lang")
      .collect()
    perLang.foreach { r =>
      val b = if (r.getString(0) == "en") 9000L else 4000L
      assert(r.getLong(1) >= b || r.getLong(2) == r.getLong(3),
        s"lang ${r.getString(0)} under budget without exhausting stratum")
    }
  }

  test("deterministic shuffle: pos is a permutation, stable across partitionings") {
    import spark.implicits._
    val docs = (1L to 400L).toDF("id")
    val mix = (col("id") * lit(2654435761L)) % lit(4294967296L)
    def run(df: org.apache.spark.sql.DataFrame, shift: Int) =
      Sampling.deterministicShuffle(df, mix, shift)
        .select("id", "pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(docs, 20)
    // 0..n-1, each exactly once
    assert(a.values.toSet == (0L until 400L).toSet)
    // matches the naive mix-order rank
    val want = (1L to 400L).sortBy(id => (id * 2654435761L) % 4294967296L)
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(a == want)
    // invariant under partitioning and bucket granularity
    assert(run(docs.repartition(13), 20) == a)
    assert(run(docs, 26) == a)
  }
}
