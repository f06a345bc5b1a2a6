package graft.queries

import graft.core.Tables
import graft.dedup.DupClusters
import org.apache.spark.sql.functions._

/**
 * Training-data pipeline operators beyond pair generation:
 *
 *  - q_dup_clusters: transitive duplicate clustering — connected
 *    components over a dup-pair edge list ([[graft.dedup.DupClusters]]),
 *    pinned against a DuckDB recursive-CTE reachability closure. The
 *    staged fixture builds path-shaped components (docs chained by
 *    alternating head/tail fingerprints), the worst case for label
 *    propagation, so the pointer-jumping convergence is what's tested —
 *    a clique fixture would converge in one round and prove nothing.
 *
 *  - q_hash_sample: deterministic stratified sampling by content hash —
 *    the reproducible train/eval split primitive. Each doc's bucket is
 *    a pure function of (doc_id, lang) via md5, so the sample is stable
 *    across runs, partitionings, and engines (no RNG state, no
 *    sampleBy); per-language rates give the stratification a data-mix
 *    pipeline needs. Entirely codegen'd builtins — the filter pushes to
 *    the scan like any other predicate, no shuffle at all.
 */
object PipelineQueries {

  final val SideRoot = "/tmp/graft_pipeline_side"

  /** Path-components fixture: component c has 8 docs (ids 8c..8c+7);
    * doc j shares its head token with neighbor pairs (2k, 2k+1) and its
    * tail-ish second token with pairs (2k+1, 2k+2) — an 8-node path. */
  private def dupDocs(s: org.apache.spark.sql.SparkSession) =
    s.range(480L).select(
      col("id").as("doc_id"),
      format_string("p%d_%d t%d_%d body filler words",
        (col("id") / 8).cast("long"), (col("id") % 8 / 2).cast("long"),
        (col("id") / 8).cast("long"), ((col("id") % 8 + 1) / 2).cast("long"))
        .as("text"))

  val q_dup_clusters: QueryDef = QueryDef.sqlChecked(
    "q_dup_clusters",
    s"""WITH RECURSIVE
       |d AS (SELECT doc_id, split_part(text, ' ', 1) AS pk,
       |             split_part(text, ' ', 2) AS sk
       |      FROM '$SideRoot/dupdocs/*.parquet'),
       |e1 AS (SELECT a.doc_id AS x, b.doc_id AS y FROM d a JOIN d b
       |       ON a.pk = b.pk AND a.doc_id < b.doc_id),
       |e2 AS (SELECT a.doc_id AS x, b.doc_id AS y FROM d a JOIN d b
       |       ON a.sk = b.sk AND a.doc_id < b.doc_id),
       |e AS (SELECT x, y FROM e1 UNION SELECT x, y FROM e2),
       |sym AS (SELECT x, y FROM e UNION SELECT y AS x, x AS y FROM e),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM d
       |  UNION
       |  SELECT s.x, reach.r FROM sym s JOIN reach ON s.y = reach.id)
       |SELECT id AS doc_id, min(r) AS cluster
       |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    dupDocs(s).write.mode("overwrite").parquet(s"$SideRoot/dupdocs")
    val d = s.read.parquet(s"$SideRoot/dupdocs")
      .select(col("doc_id"),
        split(col("text"), " ")(0).as("pk"),
        split(col("text"), " ")(1).as("sk"))
    def pairsOn(k: String) = {
      val a = d.select(col("doc_id").as("x"), col(k).as("k"))
      val b = d.select(col("doc_id").as("y"), col(k).as("k"))
      a.join(b, "k").filter(col("x") < col("y")).select("x", "y")
    }
    val edges = pairsOn("pk").union(pairsOn("sk")).distinct()
    DupClusters.components(edges)
      .select(col("id").as("doc_id"), col("cluster"))
      .orderBy("doc_id")
  }

  val q_hash_sample: QueryDef = QueryDef.sqlChecked(
    "q_hash_sample",
    """SELECT doc_id, lang, bucket FROM (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5(doc_id::VARCHAR || ':' || lang), 1, 8))::BIGINT
      |      % 1000 AS bucket
      |  FROM documents) t
      |WHERE bucket < CASE lang WHEN 'en' THEN 250 WHEN 'zh' THEN 400
      |                         WHEN 'es' THEN 550 WHEN 'de' THEN 700
      |                         ELSE 850 END
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val bucket = conv(
      substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("lang"))),
        1, 8), 16, 10).cast("long") % 1000
    val rate = when(col("lang") === "en", 250)
      .when(col("lang") === "zh", 400)
      .when(col("lang") === "es", 550)
      .when(col("lang") === "de", 700)
      .otherwise(850)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .filter(col("bucket") < rate)
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(q_dup_clusters, q_hash_sample)
}
