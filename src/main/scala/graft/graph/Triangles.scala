package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed triangle counting + local clustering coefficient over
 * the click graph — the graph-shape statistic next to [[PageRank]]
 * (communities and link farms show up as clustering anomalies in a
 * web corpus).
 *
 * Algorithm: the canonical degree-ordered orientation (the MapReduce
 * triangle algorithm of Suri & Vassilvitskii, WWW 2011): undirect and
 * de-duplicate the edges, orient every edge from its (degree, node)-
 * smaller endpoint to the larger, build wedges by self-joining
 * oriented edges on the common LOW vertex, and close each wedge with
 * one hash semi-join back against the oriented edge set. Orientation
 * bounds every join key's fan-out by the graph's degeneracy (a hub of
 * degree d contributes wedges only at its ~sqrt-bounded oriented
 * out-degree, not d^2) — total work O(m^{3/2}) instead of the naive
 * O(sum d^2); each triangle is emitted exactly once.
 *
 * Determinism: all counts are exact integers; the clustering
 * coefficient 2*T(v) / (d(v)*(d(v)-1)) is ONE IEEE division of two
 * exact integer products.
 */
object Triangles {

  /** (node, tri, d, clustering) for every vertex of the undirected
    * simple graph of `edges` (src, dst; self-loops and duplicate /
    * reverse edges collapse). tri counts triangles containing the
    * node; clustering is 0.0 for degree < 2. */
  def perNode(edges: DataFrame): DataFrame = {
    // pin the simple-graph edge list and the degree table: und feeds
    // three consumers (two degree-union branches + the orientation
    // join) and deg three (both endpoint joins + the output join), and
    // the input `edges` lineage is often a windowed click-pair
    // derivation worth executing once. Both frames are O(m)/O(V) — the
    // same order the algorithm materializes in `oriented` anyway.
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint(eager = true)
    val deg = und.select(col("u").as("n"))
      .unionByName(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .localCheckpoint(eager = true)
    val withDeg = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val ku = struct(col("du").as("kd"), col("u").as("kn"))
    val kv = struct(col("dv").as("kd"), col("v").as("kn"))
    // orient a -> b with key(a) < key(b); keep b's order key for the
    // wedge tie-break so each unordered out-pair builds ONE wedge
    val oriented = withDeg.select(
      when(ku < kv, col("u")).otherwise(col("v")).as("a"),
      when(ku < kv, col("v")).otherwise(col("u")).as("b"),
      when(ku < kv, kv).otherwise(ku).as("kb"))
      .localCheckpoint(eager = true)
    val o1 = oriented.select(col("a"), col("b"), col("kb"))
    val o2 = oriented.select(col("a"), col("b").as("c"),
      col("kb").as("kc"))
    val wedges = o1.join(o2, Seq("a"))
      .filter(col("kb") < col("kc"))
      .select(col("a"), col("b"), col("c"))
    val tris = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")),
      Seq("b", "c"), "left_semi")
    val perNodeTri = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.select(col("n").as("node"), col("d"))
      .join(perNodeTri, Seq("node"), "left")
      .select(col("node"), coalesce(col("tri"), lit(0L)).as("tri"),
        col("d"),
        when(col("d") >= 2,
          (coalesce(col("tri"), lit(0L)) * 2).cast("double") /
            (col("d") * (col("d") - 1)).cast("double"))
          .otherwise(lit(0.0)).as("clustering"))
  }
}
