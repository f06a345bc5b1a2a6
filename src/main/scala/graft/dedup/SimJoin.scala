package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EXACT Jaccard similarity self-join by prefix filtering (AllPairs /
 * PPJoin, Bayardo et al. WWW 2007) — the completeness-guaranteed
 * counterpart of the MinHash-LSH path ([[Dedup.lshPairs]] can miss
 * pairs with banding probability; this join provably emits EVERY pair
 * with J ≥ t, and only those).
 *
 * Prefix-filter principle: order each doc's token set by GLOBAL
 * rarity (document frequency asc, token asc); if J(a,b) ≥ t then a and
 * b must share a token among each one's first `|d| − ⌈t·|d|⌉ + 1`
 * tokens — so the candidate join only indexes those prefixes. Rare
 * tokens front the ordering, so prefix postings are short by
 * construction — the frequency ordering IS the skew defense (a
 * stopword's df puts it at the back of every prefix, so it never
 * becomes a join key; the residual hot-key risk sits behind AQE like
 * every other equi-join here).
 *
 * The threshold is a RATIONAL tNum/tDen and every filter is exact
 * integer arithmetic (`tDen·|a∩b| ≥ tNum·|a∪b|`), so results are
 * bit-identical across engines; the reported jaccard is one IEEE
 * division of the two exact counts.
 *
 * Stages (all bounded): distinct postings (one shuffle) → df agg →
 * per-doc rarity prefix (window bounded by doc length) → prefix
 * self-equi-join with the symmetric length filter
 * (`tDen·min(|a|,|b|) ≥ tNum·max`) → exact intersection count via two
 * cell-keyed joins → threshold. Nothing quadratic in the corpus; the
 * candidate set is the prefix join's output, which the length + rarity
 * filters keep near the true result size.
 */
object SimJoin {

  /** Pairs (a < b) with Jaccard(tokens_a, tokens_b) ≥ tNum/tDen.
    * `docs`: (idCol: long, tokCol: array<string>) — arrays are treated
    * as SETS (duplicates collapse). Returns (a, b, inter, uni, jac). */
  def jaccardJoin(docs: DataFrame, idCol: String, tokCol: String,
                  tNum: Long, tDen: Long): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold in (0,1]")
    // Pin the distinct posting list ONCE: five downstream consumers
    // (sizes, document frequencies, the prefix build, and both sides of
    // the intersection count) would otherwise each re-run the tokenize +
    // explode + distinct lineage — measured as ~10 Generate nodes in one
    // q_simjoin plan, because the small-side broadcasts duplicate the
    // subtree instead of reusing one exchange. Materializing the posting
    // list is the standard AllPairs staging step (it is the index the
    // algorithm is defined over); its size is O(total distinct tokens),
    // the same order the join shuffles anyway.
    val tok = docs
      .select(col(idCol).cast("long").as("doc"), explode(col(tokCol)).as("t"))
      .distinct()
      .localCheckpoint(eager = true)
    val sz = tok.groupBy("doc").agg(count(lit(1)).as("len"))
    val dfreq = tok.groupBy("t").agg(count(lit(1)).as("df"))

    // prefix length p = len − ceil(t·len) + 1, exact:
    // ceil(tNum·len / tDen) = (tNum·len + tDen − 1) div tDen
    val wDoc = Window.partitionBy("doc").orderBy(col("df"), col("t"))
    val prefix = tok.join(dfreq, "t").join(sz, "doc")
      .withColumn("_rn", row_number().over(wDoc))
      .withColumn("_p",
        col("len") - expr(s"(len * ${tNum}L + ${tDen - 1}L) div ${tDen}L") + 1)
      .filter(col("_rn") <= col("_p"))
      .select(col("doc"), col("t"), col("len"))

    val cand = prefix.as("pa").join(prefix.as("pb"), "t")
      .filter(col("pa.doc") < col("pb.doc"))
      .filter(lit(tDen) * least(col("pa.len"), col("pb.len")) >=
        lit(tNum) * greatest(col("pa.len"), col("pb.len")))
      .select(col("pa.doc").as("a"), col("pb.doc").as("b"))
      .distinct()

    val inter = cand
      .join(tok.select(col("doc").as("a"), col("t")), Seq("a"))
      .join(tok.select(col("doc").as("b"), col("t")), Seq("b", "t"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("doc").as("a"), col("len").as("_la")), "a")
      .join(sz.select(col("doc").as("b"), col("len").as("_lb")), "b")
      .withColumn("uni", col("_la") + col("_lb") - col("inter"))
      .filter(lit(tDen) * col("inter") >= lit(tNum) * col("uni"))
      .select(col("a"), col("b"), col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jac"))
  }
}
