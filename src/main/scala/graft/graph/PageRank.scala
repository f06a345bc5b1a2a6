package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * PageRank over a click/link multigraph in EXACT fixed-point integer
 * arithmetic — the web-graph centrality op a Common-Crawl-scale corpus
 * pipeline runs for domain/page weighting (seed-quality priors,
 * crawl-frequency budgeting).
 *
 * Determinism: floating PageRank sums contributions in shuffle order
 * (non-reproducible bits); here ranks are BIGINT micro-units
 * (2^20 = one unit of mass) and one iteration is
 *
 *   contrib(v) = sum over in-edges (u,v) of  r(u) div outdeg(u)
 *   r'(v)      = (15 * Scale + 85 * contrib(v)) div 100
 *
 * — integer div/mul/sum only, so the result is bit-identical across
 * engines, partitionings, and replays (the DuckDB dual unrolls the
 * same recurrence). Damping 0.85 is the rational 85/100; dangling
 * mass (nodes without out-edges) is dropped, the classic simplified
 * variant (documented contract, same as Spark's own example).
 *
 * Scale shape (10^10-node web graph): per iteration, ONE shuffle of
 * the edge table by src (rank join) and ONE by dst (contribution
 * agg, map-side combined); the rank table is |V| rows. Edges and
 * degrees are pinned once (localCheckpoint) and re-partitioned by
 * src so every iteration reuses the same exchange; iteration output
 * is checkpointed to truncate lineage (the DupClusters/FlowBasins
 * loop discipline). Nothing is collected.
 */
object PageRank {

  /** Fixed-point unit of rank mass (2^20). */
  final val Scale: Long = 1L << 20

  /** Click-graph edges from an event log: one edge per consecutive
    * event pair of the same user (ordered by (orderCol, tieCol) — the
    * tie column makes the sequence total, so `lead` is deterministic).
    * Repeated transitions yield parallel edges (a weighted multigraph,
    * deliberately). */
  def clickEdges(events: DataFrame, pageCol: Column, userCol: Column,
                 orderCol: Column, tieCol: Column): DataFrame = {
    val w = Window.partitionBy("_u").orderBy(col("_o"), col("_t"))
    events.select(pageCol.as("src"), userCol.as("_u"),
        orderCol.as("_o"), tieCol.as("_t"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .select("src", "dst")
  }

  /** Fixed-iteration fixed-point PageRank: (node, rank_fp BIGINT,
    * rank DOUBLE = rank_fp / Scale, one IEEE division). Every node in
    * src ∪ dst gets a row; rank starts at one full unit of mass. */
  def pageRank(edgesIn: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val edges = edgesIn.select("src", "dst")
      .repartition(col("src")).localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    var r = nodes.withColumn("r", lit(Scale))
    for (_ <- 1 to iters) r = step(edges, deg, nodes, r)
    r.select(col("node"), col("r").as("rank_fp"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** One rank update (shared by the plain and resumable drivers). */
  private def step(edges: DataFrame, deg: DataFrame, nodes: DataFrame,
                   r: DataFrame): DataFrame = {
    val contrib = edges
      .join(r.withColumnRenamed("node", "src"), "src")
      .join(deg, "src")
      .select(col("dst").as("node"), expr("r div d").as("c"))
      .groupBy("node").agg(sum("c").as("s"))
    nodes.join(contrib, Seq("node"), "left")
      .select(col("node"),
        expr(s"(15 * ${Scale}L + 85 * coalesce(s, CAST(0 AS BIGINT)))" +
          " div 100").as("r"))
      .localCheckpoint()
  }

  /** Snapshot-resumable PageRank (north rule: any stage restarts from
    * the last committed snapshot). Every iteration's FULL rank table
    * commits to `<root>/<table>` with a lineage signature binding the
    * iteration number to a deterministic content signature of the edge
    * multiset (total count + xor of per-edge (key, multiplicity)
    * hashes — order/partitioning independent, multiplicity-safe),
    * so a re-run resumes from the highest committed iteration OF THE
    * SAME GRAPH and recomputes nothing before it; a changed edge set
    * changes the signature and starts clean. Bit-exact with
    * [[pageRank]] by construction (identical integer recurrence; resume
    * replays from exact BIGINT state). */
  def pageRankResumable(edgesIn: DataFrame, iters: Int, root: String,
                        table: String = "pagerank_ranks"): DataFrame = {
    require(iters >= 1)
    val spark = edgesIn.sparkSession
    val edges = edgesIn.select("src", "dst")
      .repartition(col("src")).localCheckpoint()
    // multiset-safe content signature: xor over DISTINCT (edge, count)
    // rows. A plain xor over edge rows would cancel even multiplicities
    // (clickEdges emits parallel edges deliberately), letting distinct
    // multigraphs collide; hashing each group WITH its multiplicity
    // cannot cancel because groups are unique. bit_xor (not sum) keeps
    // the fold overflow-free under ANSI mode.
    val sigRow = edges.groupBy("src", "dst").agg(count(lit(1)).as("m"))
      .agg(sum(col("m")), expr("bit_xor(xxhash64(src, dst, m))")).head()
    val sig = s"n=${sigRow.getLong(0)} h=${sigRow.getLong(1)}"
    def lin(k: Int) = s"pagerank sig[$sig] iter=$k scale=$Scale"
    val committed = graft.meta.Snapshots.committed(root, table)
    val resumed = (iters to 1 by -1).iterator
      .flatMap(k => committed.reverse.find(_.lineage == lin(k)).map((k, _)))
      .take(1).toSeq.headOption
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint()
    val nodesDf = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    var (from, r) = resumed match {
      case Some((k, m)) => (k, graft.meta.Snapshots.read(spark, m))
      case None => (0, nodesDf.withColumn("r", lit(Scale)))
    }
    for (k <- from + 1 to iters) {
      r = step(edges, deg, nodesDf, r)
      graft.meta.Snapshots.commit(r, root, table, lin(k))
    }
    r.select(col("node"), col("r").as("rank_fp"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }
}
