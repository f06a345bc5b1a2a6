package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication family for the web-doc table (training-data pipeline
 * ops): exact, MinHash+LSH, SimHash, n-gram Jaccard. All hash math is
 * integer (md5-derived), so results are engine- and partitioning-
 * independent.
 *
 * Scale notes: exact dedup is one hash aggregate on the key; MinHash is
 * explode(shingles) -> one hash aggregate (map-side partial min) with
 * signatures as H columns, not rows; LSH pairs self-join only within
 * band buckets, and bucket populations over `maxBucket` are excluded
 * from the join (one count + one semi-join), so a degenerate bucket
 * can never go quadratic.
 */
object Dedup {

  // ---- exact ------------------------------------------------------------

  /** Keeper = min id per duplicate group of `key`. */
  def exactGroups(df: DataFrame, key: String, id: String = "doc_id"): DataFrame =
    df.groupBy(col(key))
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("copies"))

  /** Drop all but the keeper row per key — one shuffle, no join. */
  def dropDuplicatesKeepMin(df: DataFrame, key: String, id: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(id))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---- MinHash + LSH ------------------------------------------------------

  final val MinHashP = 2147483647L // 2^31 - 1
  final val NumHashes = 16
  def hashA(j: Int): Long = 1000003L + j.toLong * 7919L
  def hashB(j: Int): Long = 12345L + j.toLong * 104729L

  /** MinHash signatures over word 3-gram shingles: one row per doc,
    * columns m0..m{H-1}. Docs with < 3 tokens get no row. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = TextOps.shingles3(docs)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .withColumn("hv", TextOps.hexToLong(md5(col("s")), 8))
    val aggs = (0 until NumHashes).map { j =>
      min((lit(hashA(j)) * col("hv") + lit(hashB(j))) % lit(MinHashP)).as(s"m$j")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** SQL dual of [[minhashSignatures]] (expects `documents`). */
  def minhashSignaturesSql: String = {
    val mins = (0 until NumHashes).map { j =>
      s"min((${hashA(j)} * hv + ${hashB(j)}) % $MinHashP) AS m$j"
    }.mkString(",\n  ")
    s"""WITH ${TextOps.shingleCteSql},
       |h AS (SELECT doc_id, ${TextOps.hexToLongSql("md5(s)", 8)} AS hv FROM sh)
       |SELECT doc_id, $mins FROM h GROUP BY doc_id""".stripMargin
  }

  /** Default band-bucket population cap for [[lshPairs]]. A bucket this
    * hot is degenerate (boilerplate / empty / templated docs whose
    * signatures collide): its self-join contributes O(n²) candidate
    * pairs while carrying almost no near-dup signal that exact dedup
    * wouldn't already catch. */
  final val DefaultMaxBucket = 1000

  /** Band-bucket explosion of the signature table: one row per
    * (doc, band) with the band's concatenated hash key. */
  def bandBuckets(sigs: DataFrame, bands: Int, rows: Int): DataFrame = {
    require(bands * rows == NumHashes)
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => col(s"m${b * rows + r}").cast("string"))
      struct(lit(b).as("band"), concat_ws("_", cols: _*).as("key")).as(s"b$b")
    }
    sigs
      .withColumn("bk", explode(array(bandCols: _*)))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Buckets [[lshPairs]] will drop at the given cap, with their
    * populations — run (and log) this alongside a capped dedup so the
    * dropped volume is observable, per standard LSH practice. */
  def oversizedBuckets(sigs: DataFrame, bands: Int = 4, rows: Int = 4,
                       maxBucket: Int = DefaultMaxBucket): DataFrame =
    bandBuckets(sigs, bands, rows)
      .groupBy("band", "key").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)

  /** LSH candidate pairs from signatures: `bands` bands of `rows` hashes;
    * docs sharing any band bucket pair up; est_sim = matching hash
    * fraction. Returns (doc1, doc2, est_sim).
    *
    * Skew safety: bucket populations are counted first and buckets over
    * `maxBucket` are excluded from the self-join, so one degenerate
    * bucket can never go quadratic. The exclusion is per-bucket, not
    * per-doc — a doc dropped from a hot band still pairs through its
    * other bands. Dropped buckets are enumerable via
    * [[oversizedBuckets]]. */
  def lshPairs(sigs: DataFrame, bands: Int = 4, rows: Int = 4,
               maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // ONE hash aggregate builds each band bucket's member list; buckets
    // over the cap (or singletons, which yield no pair) drop in the same
    // pass, and the bounded in-bucket pair explosion happens map-side on
    // the aggregated row — replacing the previous count-aggregate +
    // semi-join + bucket self-join chain (three exchanges of the
    // exploded band table) with a single exchange. The member array is
    // ≤ maxBucket longs, so the aggregated row and its quadratic-
    // in-bucket explode stay memory-bounded by construction — the same
    // cap that bounded the self-join before.
    val all = bandBuckets(sigs, bands, rows)
    val pairs = all.groupBy("band", "key")
      .agg(collect_list(col("doc_id")).as("ms"))
      .filter(size(col("ms")).between(2, maxBucket))
      .select(explode(col("ms")).as("d1"), col("ms"))
      .select(col("d1"), explode(col("ms")).as("d2"))
      .filter(col("d1") < col("d2"))
      .select(col("d1").as("doc1"), col("d2").as("doc2"))
      .distinct()
    val simExpr = (0 until NumHashes)
      .map(j => when(col(s"s1.m$j") === col(s"s2.m$j"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(sigs.as("s1"), col("doc1") === col("s1.doc_id"))
      .join(sigs.as("s2"), col("doc2") === col("s2.doc_id"))
      .select(col("doc1"), col("doc2"),
        (simExpr.cast("double") / lit(NumHashes.toDouble)).as("est_sim"))
  }

  // ---- SimHash ------------------------------------------------------------

  final val SimHashBits = 16

  /** 16-bit SimHash over tokens (with multiplicity). */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("th", TextOps.hexToLong(md5(col("tok")), 4))
    val bitSums = (0 until SimHashBits).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$b")
    }
    val packed = (0 until SimHashBits)
      .map(b => when(col(s"s$b") > 0L, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  def simhashSql: String = {
    val sums = (0 until SimHashBits).map { b =>
      s"sum(CASE WHEN ((th >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(",\n  ")
    val packed = (0 until SimHashBits)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS tok FROM documents),
       |h AS (SELECT doc_id, ${TextOps.hexToLongSql("md5(tok)", 4)} AS th FROM tok),
       |bits AS (SELECT doc_id, $sums FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($packed AS BIGINT) AS simhash FROM bits""".stripMargin
  }

  // ---- embedding-cosine near-dup -------------------------------------------

  /** Exact embedding near-dup pairs: (v1, v2, cos) with cosine >= tau
    * over all pairs — the small-set VERIFIER (same positioning as
    * [[ngramJaccardPairs]]); the corpus-scale path is
    * [[embeddingNearDupPairs]]. Embeddings are L2-normalized so cosine
    * is the plain dot fold (bit-exact vs the DuckDB list_reduce dual). */
  def embeddingNearDupPairsExact(emb: DataFrame /* vec_id, v */,
                                 tau: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("v1"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("v2"), col("v").as("vb"))
    a.join(b, col("v1") < col("v2"))
      .withColumn("cos", graft.similarity.DotProduct(col("va"), col("vb")))
      .filter(col("cos") >= tau)
      .select(col("v1"), col("v2"), col("cos"))
  }

  /** Sign-LSH buckets [[embeddingNearDupPairs]] will drop at the given
    * cap, with their populations — the audit twin of
    * [[oversizedBuckets]] for the embedding path. */
  def oversizedEmbeddingBuckets(emb: DataFrame, dim: Int,
                                nPlanes: Int = 6, nTables: Int = 8,
                                maxBucket: Int = DefaultMaxBucket): DataFrame =
    graft.similarity.Ann.signBuckets(emb, dim, nPlanes, nTables)
      .groupBy("table", "bucket").agg(count(lit(1)).as("n_vecs"))
      .filter(col("n_vecs") > maxBucket)

  /** Corpus-scale embedding near-dup candidates: sign-LSH band buckets
    * replace the all-pairs cross join (same-bucket-in-any-table pairs
    * only), then the exact cosine filter. Probabilistic recall — spec'd
    * against the exact verifier on planted near-dups; at 100 TB the
    * bucket equi-join is the only shuffle and no pair of dissimilar
    * docs is ever scored.
    *
    * Skew safety (same pattern as [[lshPairs]]): bucket populations are
    * counted first and (table, bucket) groups over `maxBucket` are
    * excluded from the self-join — a near-dup corpus is by definition
    * full of colliding embeddings, exactly the input that would send one
    * bucket quadratic. A vector dropped from one hot table still pairs
    * through its other tables; dropped buckets are enumerable via
    * [[oversizedEmbeddingBuckets]]. Candidate pairs are deduplicated on
    * the id pair BEFORE the vectors are joined back, so the multi-table
    * distinct shuffles two longs per pair, not two embedding arrays. */
  def embeddingNearDupPairs(emb: DataFrame, tau: Double, dim: Int,
                            nPlanes: Int = 6, nTables: Int = 8,
                            maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val all = graft.similarity.Ann.signBuckets(emb, dim, nPlanes, nTables)
      .select(col("vec_id"), col("table"), col("bucket"))
    val smallEnough = all.groupBy("table", "bucket")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket)
      .select("table", "bucket")
    val buckets = all.join(smallEnough, Seq("table", "bucket"), "left_semi")
    val pairs = buckets.as("a").join(buckets.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .distinct()
    val vecs = emb.select(col("vec_id"), col("v"))
    pairs
      .join(vecs.as("ea"), col("v1") === col("ea.vec_id"))
      .join(vecs.as("eb"), col("v2") === col("eb.vec_id"))
      .withColumn("cos", graft.similarity.DotProduct(col("ea.v"), col("eb.v")))
      .filter(col("cos") >= tau)
      .select(col("v1"), col("v2"), col("cos"))
  }

  // ---- n-gram Jaccard -----------------------------------------------------

  /** Exact Jaccard over distinct 3-gram shingle sets for all pairs within
    * a (small, pre-filtered) doc set. */
  def ngramJaccardPairs(docs: DataFrame): DataFrame = {
    val d = TextOps.shingles3(docs)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .distinct()
    val sz = d.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = d.as("a").join(d.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sz.as("na"), col("d1") === col("na.doc_id"))
      .join(sz.as("nb"), col("d2") === col("nb.doc_id"))
      .select(col("d1"), col("d2"), col("n_inter"),
        (col("n_inter") / (col("na.n") + col("nb.n") - col("n_inter"))).as("jaccard"))
  }
}
