package graft

import graft.core.Tables
import graft.similarity.{Ann, Pq}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private val M = 16
  private val NC = 32

  private def corpus = Ann.withVec(Tables.embeddings(spark, sfSmoke))
    .filter(col("vec_id") >= 3).select(col("vec_id"), col("v"))

  private def sampleArr = {
    import spark.implicits._
    corpus.orderBy(col("vec_id")).limit(256)
      .select(col("v")).as[Seq[Double]].collect().map(_.toArray)
  }

  test("codebook training is deterministic and uses every subspace") {
    val a = Pq.train(sampleArr, M, NC, iters = 4)
    val b = Pq.train(sampleArr, M, NC, iters = 4)
    assert(a.cents.flatten.flatten.toSeq == b.cents.flatten.flatten.toSeq)
    assert(a.m == M && a.ncode == NC && a.w == 64 / M)
    // training moved the centroids off their init (first-NC subvectors)
    val init = sampleArr.take(NC)
    val moved = (0 until M).exists { s =>
      (0 until NC).exists { c =>
        a.cents(s)(c).toSeq !=
          init(c).slice(s * a.w, (s + 1) * a.w).toSeq
      }
    }
    assert(moved, "Lloyd rounds never updated any centroid")
  }

  test("encode emits one in-range code per subspace") {
    val cb = Pq.train(sampleArr, M, NC, iters = 4)
    val enc = Pq.encode(corpus, cb)
    import spark.implicits._
    val codes = enc.select(col("codes")).as[Seq[Int]].collect()
    assert(codes.nonEmpty)
    assert(codes.forall(c => c.length == M && c.forall(x => x >= 0 && x < NC)))
    // codes discriminate: not every vector maps to one codeword tuple
    assert(codes.distinct.length > codes.length / 10)
  }

  test("ADC top-k approximates brute-force cosine (recall@10 on fixture)") {
    import spark.implicits._
    val e = Ann.withVec(Tables.embeddings(spark, sfSmoke))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val cb = Pq.train(sampleArr, M, NC, iters = 4)
    val queries = q.orderBy(col("qid")).as[(Long, Seq[Double])]
      .collect().map { case (id, v) => (id, v.toArray) }.toSeq
    val got = Pq.adcTopK(queries, Pq.encode(corpus, cb), cb, 10)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact cosine of EVERY (query, vector) pair, for both metrics below
    val nCorpus = corpus.count().toInt
    val allExact = Ann.bruteForceTopK(q, corpus, nCorpus)
      .select(col("qid"), col("vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = allExact.toSeq.groupBy(_._1._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(-_._2).take(10).map(_._1)
    }.toSet
    val recall = got.intersect(want).size.toDouble / want.size
    info(s"got=${got.toSeq.sorted.take(5)} want=${want.toSeq.sorted.take(5)} " +
      s"sizes ${got.size}/${want.size} allExact=${allExact.size}")
    // the fixture is near-isotropic (rank-10 vs rank-11 margins ~0.002
    // cosine), so strict set recall under-measures quantization quality;
    // the honest pair of bounds: far better than random (10/497 ~ 2%),
    // and the TRUE cosine mass of PQ's picks close to the optimum's
    assert(recall >= 0.25, s"PQ recall@10 too low: $recall")
    val gotMass = got.toSeq.map(allExact).sum
    val optMass = want.toSeq.map(allExact).sum
    assert(gotMass >= 0.85 * optMass,
      s"PQ picks lose cosine mass: $gotMass vs optimal $optMass")
  }

  test("IVF-PQ returns k ranked rows per query from probed lists only") {
    import spark.implicits._
    val e = Ann.withVec(Tables.embeddings(spark, sfSmoke))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val cb = Pq.train(sampleArr, M, NC, iters = 4)
    val got = Pq.ivfPqTopK(q, corpus, cb, 10, nList = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.length == 30)
    assert(got.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == (1 to 10)))
    // probe pruning engages: candidates come from <= nProbe/nList of the
    // corpus, so the scored set per query is a strict subset
    val (_, assign) = Ann.ivfIndex(corpus, 16, 2)
    val listOf = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val listsHit = got.groupBy(_._1).map { case (_, rows) =>
      rows.map(r => listOf(r._2)).distinct.length
    }
    assert(listsHit.forall(_ <= 4), s"results crossed more than nProbe lists")
    // deterministic across partitionings
    val again = Pq.ivfPqTopK(q, corpus.repartition(7), cb, 10,
      nList = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.toSeq.sorted == again.toSeq.sorted)
  }

  test("ADC is deterministic across partitionings") {
    import spark.implicits._
    val cb = Pq.train(sampleArr, M, NC, iters = 4)
    val queries = Seq((0L, sampleArr.head))
    def run(parts: Int) =
      Pq.adcTopK(queries, Pq.encode(corpus.repartition(parts), cb), cb, 5)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(run(2) == run(7))
  }
}
