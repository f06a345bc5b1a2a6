package graft

import graft.dedup.Dedup
import graft.similarity.Ann
import graft.core.Tables
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def synthDocs = {
    import spark.implicits._
    // base texts + near-duplicates (one word changed) + exact duplicates
    val words = Seq("the", "data", "query", "table", "spark", "join", "scan",
      "merge", "sort", "filter", "agg", "window")
    def text(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      Seq.fill(n)(words(r.nextInt(words.size))).mkString(" ")
    }
    val base = (0 until 20).map(i => (i.toLong, text(i, 60)))
    val nearDups = (0 until 5).map { i =>
      val t = base(i)._2.split(" ").updated(30, "CHANGED").mkString(" ")
      (100L + i, t)
    }
    val exactDups = (0 until 3).map(i => (200L + i, base(i)._2))
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("decontaminate: overlap counts shared shingles, clean drops flagged docs") {
    import spark.implicits._
    import graft.dedup.Decontaminate
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 'beta gamma delta' x2
      (2L, "zeta eta theta iota kappa"), // disjoint
      (3L, "one two beta gamma delta three")) // shares one 3-gram
      .toDF("doc_id", "text")
    val bench = Seq((100L, "xx beta gamma delta epsilon yy"))
      .toDF("doc_id", "text")
    val got = Decontaminate.overlap(corpus, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 1 shares 'beta gamma delta' and 'gamma delta epsilon'; doc 3 one
    assert(got == Map(1L -> 2L, 3L -> 1L))
    val kept = Decontaminate.clean(corpus, bench).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
    // threshold: requiring >= 2 shared shingles spares the 1-gram doc
    val kept2 = Decontaminate.clean(corpus, bench, minSharedToDrop = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(2L, 3L))
    // fractional score: every doc present, clean docs at exactly 0.0;
    // doc 1 has 3 distinct shingles, 2 shared -> 2/3; doc 3: 1/4
    val sc = Decontaminate.score(corpus, bench)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(sc(1L) == ((3L, 2L, 2.0 / 3.0)))
    assert(sc(2L) == ((3L, 0L, 0.0)))
    assert(sc(3L) == ((4L, 1L, 0.25)))
  }

  test("redactPii scrubs emails, ipv4, phones; leaves clean text alone") {
    import spark.implicits._
    import graft.text.TextOps
    val rows = Seq(
      "reach me at bob.smith+x@corp.example.org thanks",
      "server 192.168.0.1 responded",
      "call +1 (555) 010-7788 today",
      "nothing sensitive here at all").toDF("t")
    val got = rows.select(TextOps.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      s"reach me at ${TextOps.PiiToken} thanks",
      s"server ${TextOps.PiiToken} responded",
      s"call ${TextOps.PiiToken} today",
      "nothing sensitive here at all"))
  }

  test("dropDuplicatesKeepMin keeps min doc_id per text") {
    val out = Dedup.dropDuplicatesKeepMin(synthDocs, "text")
    assert(out.count() == 25) // 20 base + 5 near-dups, exact dups dropped
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(Set(0L, 1L, 2L).subsetOf(kept) && !kept.exists(_ >= 200L))
  }

  test("minhash LSH finds near-duplicate pairs with high est_sim") {
    val sigs = Dedup.minhashSignatures(synthDocs)
    val pairs = Dedup.lshPairs(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every exact dup must pair with its source at est_sim 1.0
    (0 until 3).foreach { i =>
      assert(pairs.exists(p => p._1 == i && p._2 == 200L + i && p._3 == 1.0),
        s"missing exact-dup pair $i <-> ${200 + i}")
    }
    // near-dups (1 of 58 shingle positions changed -> 3 shingles differ)
    val nearFound = (0 until 5).count(i =>
      pairs.exists(p => p._1 == i && p._2 == 100L + i && p._3 >= 0.5))
    assert(nearFound >= 4, s"only $nearFound/5 near-dup pairs found")
    // unrelated docs must not dominate: no pair between distinct base docs
    // with est_sim 1.0
    assert(!pairs.exists(p => p._1 < 20 && p._2 < 20 && p._3 == 1.0))
  }

  test("lshPairs caps degenerate buckets and still finds planted near-dups") {
    import spark.implicits._
    // 90%-degenerate corpus: 180 docs share ONE text (all four band
    // buckets identical -> 16,110 quadratic pairs if uncapped), plus a
    // planted near-dup pair and some distinct docs
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 8
    val degenerate = (0 until 180).map(i => (i.toLong, boiler))
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def distinct(seed: Int) = {
      val r = new scala.util.Random(seed)
      Seq.fill(60)(words(r.nextInt(words.size))).mkString(" ")
    }
    val base = (1000 until 1010).map(i => (i.toLong, distinct(i)))
    val planted = {
      val t = distinct(1000).split(" ").updated(30, "CHANGED").mkString(" ")
      Seq((2000L, t))
    }
    val docs = (degenerate ++ base ++ planted).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs).localCheckpoint()

    val dropped = Dedup.oversizedBuckets(sigs, maxBucket = 50).collect()
    assert(dropped.nonEmpty && dropped.forall(_.getLong(2) == 180L),
      "the degenerate bucket must be reported as dropped")

    val pairs = Dedup.lshPairs(sigs, maxBucket = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // bounded: the 180-doc bucket contributes zero pairs
    assert(!pairs.exists(p => p._1 < 180 && p._2 < 180),
      "degenerate bucket leaked quadratic pairs")
    assert(pairs.length < 100, s"candidate set not bounded: ${pairs.length}")
    // the planted near-dup still pairs through its (small) buckets
    assert(pairs.exists(p => p._1 == 1000L && p._2 == 2000L && p._3 >= 0.5),
      "planted near-dup lost to the cap")
  }

  test("simhash of near-duplicates is close in hamming distance") {
    val sh = Dedup.simhash(synthDocs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0 until 3).foreach(i => assert(hamming(sh(i.toLong), sh(200L + i)) == 0))
    (0 until 5).foreach(i => assert(hamming(sh(i.toLong), sh(100L + i)) <= 6))
  }

  test("lsh topk achieves recall vs brute force on real embeddings") {
    val e = Ann.withVec(Tables.embeddings(spark, sfSmoke))
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val t = e.filter(col("vec_id") >= 5).select(col("vec_id"), col("v"))
    val exact = Ann.bruteForceTopK(q, t, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(q, t, 5, dim = 64, nPlanes = 4, nTables = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low for 4-plane 12-table LSH")
    // LSH results are always true cosines; ranks within bucket are exact
    assert(approx.nonEmpty)
  }

  test("embedding near-dup: bucketed path finds planted dups, subset of exact") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(5)
    def unit(seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(dim)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    def perturb(v: Array[Double], eps: Double): Array[Double] = {
      val w = v.map(_ + rnd.nextGaussian() * eps)
      val n = math.sqrt(w.map(x => x * x).sum)
      w.map(_ / n)
    }
    val base = (0 until 40).map(i => (i.toLong, unit(i).toSeq))
    // planted near-dups: ids 100+i are tiny perturbations of ids 0..9
    val dups = (0 until 10).map(i =>
      (100L + i, perturb(base(i)._2.toArray, 0.02).toSeq))
    val emb = (base ++ dups).toDF("vec_id", "v")
    val tau = 0.95
    val exact = Dedup.embeddingNearDupPairsExact(emb, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Dedup.embeddingNearDupPairs(emb, tau, dim,
      nPlanes = 4, nTables = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair is a true near-dup
    (0 until 10).foreach(i => assert(exact((i.toLong, 100L + i)), s"planted $i"))
    // bucketed candidates never invent pairs...
    assert(bucketed.subsetOf(exact), "bucketed produced a non-near-dup pair")
    // ...and recall the planted ones at these LSH settings
    val found = (0 until 10).count(i => bucketed((i.toLong, 100L + i)))
    assert(found >= 8, s"only $found/10 planted near-dups recalled")
  }

  test("embedding near-dup: degenerate corpus is capped, planted dups survive") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(11)
    def unit(seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(dim)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    def perturb(v: Array[Double], eps: Double): Array[Double] = {
      val w = v.map(_ + rnd.nextGaussian() * eps)
      val n = math.sqrt(w.map(x => x * x).sum)
      w.map(_ / n)
    }
    // 90%-degenerate corpus: 180 copies of ONE embedding (every table's
    // bucket holds all 180 -> 16,110 quadratic pairs per table if
    // uncapped), plus 10 base vectors and 10 planted near-dups of them
    val boiler = unit(999).toSeq
    val degenerate = (0 until 180).map(i => (i.toLong, boiler))
    val base = (0 until 10).map(i => (1000L + i, unit(i).toSeq))
    val dups = (0 until 10).map(i =>
      (2000L + i, perturb(base(i)._2.toArray, 0.02).toSeq))
    val emb = (degenerate ++ base ++ dups).toDF("vec_id", "v").localCheckpoint()

    val dropped = Dedup.oversizedEmbeddingBuckets(emb, dim,
      nPlanes = 4, nTables = 12, maxBucket = 50).collect()
    assert(dropped.nonEmpty && dropped.forall(_.getLong(2) >= 180L),
      "the degenerate buckets must be reported as dropped")

    val pairs = Dedup.embeddingNearDupPairs(emb, tau = 0.95, dim = dim,
      nPlanes = 4, nTables = 12, maxBucket = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // bounded: the 180-copy cluster contributes zero pairs
    assert(!pairs.exists(p => p._1 < 180 && p._2 < 180),
      "degenerate bucket leaked quadratic pairs")
    assert(pairs.size < 100, s"candidate set not bounded: ${pairs.size}")
    // planted near-dups still pair through their (small) buckets
    val found = (0 until 10).count(i => pairs((1000L + i, 2000L + i)))
    assert(found >= 8, s"only $found/10 planted near-dups survived the cap")
  }

  test("ivf topk: deterministic, decent recall, bounded probe fraction") {
    val e = Ann.withVec(Tables.embeddings(spark, sfSmoke))
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val t = e.filter(col("vec_id") >= 5).select(col("vec_id"), col("v"))
    val exact = Ann.bruteForceTopK(q, t, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a1 = Ann.ivfTopK(q, t, 5, nList = 8, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val a2 = Ann.ivfTopK(q, t, 5, nList = 8, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a1.toSeq == a2.toSeq, "ivf not deterministic")
    val recall = (exact & a1.toSet).size.toDouble / exact.size
    assert(recall >= 0.4, s"ivf recall $recall too low for nProbe=nList/2")
    // probing all lists must equal brute force exactly
    val full = Ann.ivfTopK(q, t, 5, nList = 8, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "nProbe=nList must reduce to brute force")
  }
}
