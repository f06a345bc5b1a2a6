package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact-quota deterministic stratified sampling — "exactly N docs per
 * language", the data-mix primitive next to the rate-based hash sample
 * (`q_hash_sample`): rates give binomially-noisy stratum sizes, quotas
 * give exact ones, which is what a token-budgeted training mix actually
 * specifies. Selection is the first `quota(stratum)` rows of each
 * stratum in md5(id) order — a pure function of the ids, so the sample
 * is reproducible across runs, partitionings, and engines, and adding or
 * removing OTHER strata never changes a stratum's picks.
 *
 * Scale shape — the naive plan (rank every row with one window) sorts
 * ENTIRE strata to keep a handful of rows; at 10^12 docs a window over
 * an 80%-English corpus is a near-full-corpus sort. [[stratifiedExact]]
 * instead runs the classic two-phase threshold select:
 *
 *   1. prefilter rows whose 16-bit md5-prefix bucket falls below a
 *      threshold (a scan-time predicate, no shuffle);
 *   2. per-stratum sufficiency check (one small aggregate): a stratum is
 *      SAFE if the prefilter kept >= min(quota, stratum size) rows —
 *      because the bucket is the hash-order PREFIX, the candidate set of
 *      a safe stratum provably contains that stratum's true top-quota;
 *   3. rank only the candidates; any deficient stratum (rare for any
 *      sane threshold, but possible) falls back to full-stratum ranking,
 *      preserving EXACTNESS rather than an "almost always right" sample.
 *
 * The result is bit-identical to the naive single-window plan (the
 * oracle runs that plan), while the sort touches ~threshold/65536 of the
 * corpus. Stratum count is assumed driver-small (languages, domains
 * tiers) — the sufficiency decision is a bounded collect, same contract
 * as the AOI/centroid tables elsewhere in the engine.
 */
object Sampling {

  /** md5-prefix bucket in [0, 65536): the first 4 hex chars of the rank
    * key, so `bucket < t` keeps exactly the hash-order prefix. */
  private def bucket(rankKey: Column): Column =
    conv(substring(rankKey, 1, 4), 16, 10).cast("int")

  /** Exact-quota stratified sample.
    *
    * @param df           input rows
    * @param stratumCol   stratum column name (e.g. "lang")
    * @param idCol        unique id column (rank key = md5(id))
    * @param quotaExpr    per-row quota as a Column over the stratum (e.g.
    *                     a `when` chain or a literal)
    * @param threshold    prefilter bucket threshold in [1, 65536]; 65536
    *                     disables the prefilter (single-phase)
    * @return input rows of the sample plus `rk` (1-based rank within the
    *         stratum's hash order)
    */
  def stratifiedExact(df: DataFrame, stratumCol: String, idCol: String,
                      quotaExpr: Column, threshold: Int = 4096): DataFrame = {
    val keyed = df.withColumn("_rk_key", md5(col(idCol).cast("string")))
    val cand = keyed.filter(bucket(col("_rk_key")) < threshold)

    // sufficiency: candidates(stratum) >= min(quota, total(stratum)).
    // One conditional aggregate over the keyed lineage replaces the old
    // totals-agg + candidate-agg + join (two full scans of the md5
    // lineage and an extra exchange) — same counts, same decision.
    val deficient = keyed.groupBy(stratumCol)
      .agg(count(lit(1)).as("_total"), first(quotaExpr).as("_quota"),
        count(when(bucket(col("_rk_key")) < threshold, lit(1))).as("_cand"))
      .filter(col("_cand") < least(col("_quota"), col("_total")))
      .select(col(stratumCol)).collect().map(_.get(0)).toSet

    // NULL-safe membership (<=>): a NULL stratum is a real group (groupBy
    // and the window both treat it as one), so the deficiency split must
    // route it like any other — `isInCollection` is three-valued and
    // would silently drop NULL-stratum rows from BOTH branches whenever
    // any stratum is deficient, making the sample depend on other strata.
    val isDeficient = deficient.foldLeft(lit(false))((acc, v) =>
      acc || (col(stratumCol) <=> lit(v)))
    val pool =
      if (deficient.isEmpty) cand
      else cand.filter(!isDeficient).unionByName(keyed.filter(isDeficient))

    val w = Window.partitionBy(stratumCol).orderBy(col("_rk_key"), col(idCol))
    pool.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quotaExpr)
      .drop("_rk_key")
  }

  /** Token-BUDGETED stratified sample — "N tokens of each language",
    * which is how a training mix is actually specified (doc counts are
    * the proxy; budgets are the spec). Per stratum, rows are taken in
    * md5(id) order while the EXCLUSIVE running token sum is below the
    * stratum's budget: the first row crossing the budget is included, so
    * the sampled token total is the smallest hash-prefix total >= budget
    * (or the whole stratum when it runs out). Same two-phase threshold
    * select as [[stratifiedExact]] and provably identical to the naive
    * per-stratum running-sum window: candidates are a hash-ORDER-prefix
    * of each stratum, so a stratum is safe exactly when its candidates'
    * token sum reaches the budget (or the candidates are the entire
    * stratum) — then the selected prefix is inside the candidate set and
    * its internal order is unchanged. Deficient strata fall back to
    * full-stratum ranking, preserving exactness.
    *
    * @param budgetExpr per-row token budget as a Column over the stratum
    * @return sampled rows plus `tok_before` (the exclusive running token
    *         sum in stratum hash order — provenance for cut auditing)
    */
  def tokenBudget(df: DataFrame, stratumCol: String, idCol: String,
                  tokensCol: String, budgetExpr: Column,
                  threshold: Int = 4096): DataFrame = {
    val keyed = df.withColumn("_rk_key", md5(col(idCol).cast("string")))
    val cand = keyed.filter(bucket(col("_rk_key")) < threshold)

    // sufficiency: candidate token sum >= budget, or candidates == stratum.
    // Fused into one conditional aggregate (same rewrite as
    // [[stratifiedExact]]): one scan, no join, identical decision.
    val inCand = bucket(col("_rk_key")) < threshold
    val deficient = keyed.groupBy(stratumCol)
      .agg(count(lit(1)).as("_total"), first(budgetExpr).as("_budget"),
        count(when(inCand, lit(1))).as("_cand"),
        sum(when(inCand, col(tokensCol))).as("_ctok"))
      .filter(coalesce(col("_ctok"), lit(0L)) < col("_budget") &&
        col("_cand") < col("_total"))
      .select(col(stratumCol)).collect().map(_.get(0)).toSet

    // NULL-safe stratum routing — same contract as stratifiedExact
    val isDeficient = deficient.foldLeft(lit(false))((acc, v) =>
      acc || (col(stratumCol) <=> lit(v)))
    val pool =
      if (deficient.isEmpty) cand
      else cand.filter(!isDeficient).unionByName(keyed.filter(isDeficient))

    val w = Window.partitionBy(stratumCol).orderBy(col("_rk_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    pool.withColumn("tok_before",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .filter(col("tok_before") < budgetExpr)
      .drop("_rk_key")
  }

  /** Deterministic global corpus shuffle: adds `pos` — the row's 0-based
    * position in a reproducible pseudo-random permutation of the whole
    * table — the training-data ordering primitive ("shuffle the corpus,
    * but bit-identically on every rerun"). The permutation is the sort
    * order of `mixKey`, which MUST be injective on the rows (e.g. an
    * odd-multiplier mix of a unique id; ties would make ranks
    * partitioning-dependent). Rank is computed as the two-level
    * [[graft.core.PrefixSum]] of 1 in mix order — one hash agg + one
    * keyed window, never the single-task global-order window that
    * `row_number() OVER (ORDER BY ...)` plans at corpus scale.
    *
    * @param bucketShift coarsening of the mix key into scan buckets
    *                    (same contract as [[graft.text.Packing]]):
    *                    buckets must stay driver-small AND per-bucket row
    *                    counts executor-sized. */
  def deterministicShuffle(df: DataFrame, mixKey: Column,
                           bucketShift: Int = 20): DataFrame = {
    val keyed = df.withColumn("_mix", mixKey).withColumn("_one", lit(1L))
    graft.core.PrefixSum
      .exclusive(keyed, "_mix", "_one",
        shiftrightunsigned(col("_mix"), bucketShift))
      .withColumnRenamed("prefix", "pos")
      .drop("_one", "_mix")
  }
}
