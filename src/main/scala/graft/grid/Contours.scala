package graft.grid

import graft.dedup.DupClusters
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Marching-squares contour extraction over the sparse cell table — the
 * vector product a DSM/DTM consumer derives next after gridding (the
 * gdal_contour analog for pubgeo's DSM outputs; the reference stops at
 * raster + building outlines, `shr3d.cpp`'s products, so this extends
 * the same raster→vector family as `vector.Vectorize`).
 *
 * Semantics (deterministic, exact): a 2x2 block of occupied cells
 * (all four corners present — sparse voids suppress the block) is
 * classified by which corners sit at-or-above the level (`z >= t`);
 * each of the 16 cases emits 0, 1, or 2 straight segments whose
 * endpoints interpolate along crossing edges: f = (t - z1)/(z2 - z1),
 * ONE IEEE division of two exact integers, so every coordinate is
 * bit-identical across engines. Saddle cases (5/10) disambiguate with
 * the exact-integer center rule `z00+z10+z01+z11 >= 4*t`. Endpoints
 * are ordered by edge priority bottom < right < top < left; two-segment
 * cases list the bottom-touching segment first — a total output order.
 *
 * Scale shape: blocks build with ONE shuffle (each cell splats to its
 * <=4 blocks, hash-aggregated by block key — the 2x2 analog of the
 * halo-exchange tile build); classification + interpolation are
 * map-only column expressions; levels multiply rows map-side only.
 * Dissolving segments into polylines needs no geometry: two segments
 * are connected iff they cross the SAME grid edge at the same level
 * (an exact (orient, ex, ey) key — no float comparisons), each such
 * edge joins at most its two adjacent blocks, so the adjacency build
 * is one self-join on the edge key and the labeling reuses the
 * pointer-jumping components loop (O(log path) rounds).
 */
object Contours {

  /** Per-level contour segments over `cells` (gx, gy, v):
    * (level, bx, by, seg, x1, y1, x2, y2, e1o, e1x, e1y, e2o, e2x, e2y)
    * where (e*o, e*x, e*y) identifies the crossed grid edge
    * (orient 0 = horizontal edge from (ex,ey) to (ex+1,ey),
    * orient 1 = vertical edge from (ex,ey) to (ex,ey+1)). */
  def segments(cells: DataFrame, levels: Seq[Long]): DataFrame = {
    require(levels.nonEmpty && levels.distinct.size == levels.size,
      "levels must be non-empty and distinct")
    val corners = cells.select(
      explode(array(
        (0 to 3).map { role =>
          val dx = role % 2; val dy = role / 2
          struct((col("gx") - dx).as("bx"), (col("gy") - dy).as("by"),
            lit(role).as("role"), col("v").as("v"))
        }: _*)).as("c"))
      .select(col("c.bx").as("bx"), col("c.by").as("by"),
        col("c.role").as("role"), col("c.v").as("v"))
    def zAt(r: Int) = max(when(col("role") === r, col("v")))
    val blocks = corners.groupBy("bx", "by")
      .agg(zAt(0).as("z00"), zAt(1).as("z10"),
        zAt(2).as("z01"), zAt(3).as("z11"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") === 4)
      .withColumn("t", explode(typedLit(levels)))

    val Seq(z00, z10, z01, z11, t) =
      Seq("z00", "z10", "z01", "z11", "t").map(col)
    def in(z: Column) = when(z >= t, 1).otherwise(0)
    val idx = in(z00) + in(z10) * 2 + in(z11) * 4 + in(z01) * 8
    val centerIn = (z00 + z10 + z01 + z11) >= t * 4
    def f(za: Column, zb: Column) = (t - za).cast("double") / (zb - za)
    val bxd = col("bx").cast("double")
    val byd = col("by").cast("double")
    // crossing points, each tagged with its exact grid-edge identity
    def pt(x: Column, y: Column, eo: Int, ex: Column, ey: Column) =
      struct(x.as("x"), y.as("y"), lit(eo).as("eo"),
        ex.cast("long").as("ex"), ey.cast("long").as("ey"))
    val pB = pt(bxd + f(z00, z10), byd, 0, col("bx"), col("by"))
    val pR = pt(bxd + 1.0, byd + f(z10, z11), 1, col("bx") + 1, col("by"))
    val pT = pt(bxd + f(z01, z11), byd + 1.0, 0, col("bx"), col("by") + 1)
    val pL = pt(bxd, byd + f(z00, z01), 1, col("bx"), col("by"))
    def seg(a: Column, b: Column) = struct(a.as("p1"), b.as("p2"))
    val segList =
      when(idx === 1 || idx === 14, array(seg(pB, pL)))
        .when(idx === 2 || idx === 13, array(seg(pB, pR)))
        .when(idx === 3 || idx === 12, array(seg(pR, pL)))
        .when(idx === 4 || idx === 11, array(seg(pR, pT)))
        .when(idx === 6 || idx === 9, array(seg(pB, pT)))
        .when(idx === 7 || idx === 8, array(seg(pT, pL)))
        .when((idx === 5 && centerIn) || (idx === 10 && !centerIn),
          array(seg(pB, pR), seg(pT, pL)))
        .when((idx === 5 && !centerIn) || (idx === 10 && centerIn),
          array(seg(pB, pL), seg(pR, pT)))

    blocks
      .filter(idx =!= 0 && idx =!= 15)
      .select(t.as("level"), col("bx"), col("by"),
        posexplode(segList).as(Seq("seg", "s")))
      .select(col("level"), col("bx"), col("by"), col("seg"),
        col("s.p1.x").as("x1"), col("s.p1.y").as("y1"),
        col("s.p2.x").as("x2"), col("s.p2.y").as("y2"),
        col("s.p1.eo").as("e1o"), col("s.p1.ex").as("e1x"),
        col("s.p1.ey").as("e1y"),
        col("s.p2.eo").as("e2o"), col("s.p2.ex").as("e2x"),
        col("s.p2.ey").as("e2y"))
  }

  /** Arithmetic segment id: ((li*2^28 + bx)*2^28 + by)*2 + seg. Fits
    * signed 64-bit for < 32 levels and coords < 2^28 (a 0.15 m world
    * grid). The level bound is require()'d by the callers; the
    * coordinate bound is a PRECONDITION (grids at or beyond 2^28 cells
    * per axis must be tiled before contouring — checking it would cost
    * an aggregate pass over the segments per call). */
  private def segId(li: Column, bx: Column, by: Column,
                    seg: Column): Column =
    ((li * (1L << 28) + bx) * (1L << 28) + by) * 2 + seg

  /** Packed exact edge key: (orient * 2^28 + ex) * 2^28 + ey. */
  private def eKey(o: Column, x: Column, y: Column): Column =
    (o.cast("long") * (1L << 28) + x) * (1L << 28) + y

  /** Ordered polyline traversal: (level, line_id, pos, x, y, closed) —
    * the per-line vertex chain a WKT LINESTRING needs, with pos 0..L
    * for an L-segment line and first == last exactly when the line is
    * a closed ring.
    *
    * Deterministic contract: every segment becomes two directed ARCS
    * (enter one endpoint edge, exit the other); the arc successor is
    * the unique neighboring arc entering at the exit edge (grid edges
    * touch at most two segments, so this is a function). Open lines
    * keep their two natural end-arcs as traversal heads; closed rings
    * are cut just before both arcs of their minimum segment id. Of the
    * two opposite traversals every line then has, the one whose head
    * minimizes (enter-edge key, arc id) is canonical. Arc positions
    * come from the same active-frontier pointer-doubling loop the flow
    * family uses ([[FlowBasins.resolve]]) — O(log L) join rounds, no
    * per-line sequential walk on the engine side (the DuckDB dual IS
    * that sequential walk). */
  def orderedVertices(segs: DataFrame, levels: Seq[Long],
                      maxRounds: Int = 64): DataFrame = {
    require(levels.size <= 15, "arc ids pack <= 15 levels")
    val spark = segs.sparkSession
    import spark.implicits._
    val lvlIdx = broadcast(
      levels.zipWithIndex.map { case (t, i) => (t, i.toLong) }
        .toDF("level", "li"))
    val base = segs.join(lvlIdx, "level")
      .withColumn("sid",
        segId(col("li"), col("bx"), col("by"), col("seg")))
      .localCheckpoint(eager = true)
    // dissolve over the PINNED base — reusing the materialized segment
    // table instead of re-deriving it from `segs` (whose lineage is the
    // whole marching-squares chain: splat, block aggregate, level
    // explode) a second time inside polylines()
    val sidLine = base
      .join(polylinesOf(base), Seq("level", "bx", "by", "seg"))
      .select(col("sid"), col("line_id"))
      .localCheckpoint(eager = true)

    def arcSel(dir: Int) = {
      val (pin, pout) = if (dir == 0) ("1", "2") else ("2", "1")
      base.select(col("level"), (col("sid") * 2 + dir).as("aid"),
        col("sid"),
        eKey(col(s"e${pin}o"), col(s"e${pin}x"), col(s"e${pin}y"))
          .as("inKey"),
        eKey(col(s"e${pout}o"), col(s"e${pout}x"), col(s"e${pout}y"))
          .as("outKey"),
        col(s"x$pin").as("ix"), col(s"y$pin").as("iy"),
        col(s"x$pout").as("ox"), col(s"y$pout").as("oy"))
    }
    val arcs = arcSel(0).unionByName(arcSel(1)).localCheckpoint(eager = true)

    val succ0 = arcs.as("a")
      .join(arcs.as("b"),
        $"a.level" === $"b.level" && $"a.outKey" === $"b.inKey" &&
          $"a.sid" =!= $"b.sid", "left")
      .select($"a.aid", $"a.sid", $"b.aid".as("naid"))

    // closed rings = lines where no arc lacks a successor
    val lineOfArc = succ0.join(sidLine, "sid")
    val openLines = lineOfArc.filter(col("naid").isNull)
      .select("line_id").distinct()
    val cycleCuts = sidLine
      .join(openLines, Seq("line_id"), "left_anti")
      .groupBy("line_id").agg(min("sid").as("msid"))
      .select(explode(array(col("msid") * 2, col("msid") * 2 + 1))
        .as("cutAid"))
    val succ = succ0
      .join(cycleCuts, succ0("naid") === cycleCuts("cutAid"), "left")
      .select(col("aid"),
        when(col("cutAid").isNotNull, lit(null).cast("long"))
          .otherwise(col("naid")).as("naid"))
      .localCheckpoint(eager = true)

    // rank every arc to its traversal tail (self-loop convention)
    val ranked = FlowBasins.resolve(
      succ.select(col("aid").as("id"),
        coalesce(col("naid"), col("aid")).as("nid"),
        col("naid").isNotNull.cast("long").as("w")), maxRounds)
      .withColumnRenamed("id", "aid")
      .withColumnRenamed("nid", "tail")
      .withColumnRenamed("w", "dist")

    // heads = arcs that are nobody's successor; canonical head per line
    // minimizes (enter-edge key, arc id)
    val heads = arcs
      .join(succ.filter(col("naid").isNotNull)
        .select(col("naid").as("aid")), Seq("aid"), "left_anti")
      .join(ranked, "aid")
      .join(sidLine, "sid")
      .select(col("line_id"), col("inKey"), col("aid"), col("tail"),
        col("dist"))
    val chosen = heads
      .groupBy("line_id")
      .agg(min(struct(col("inKey"), col("aid"), col("tail"),
        col("dist"))).as("c"))
      .select(col("line_id"), col("c.tail").as("tail"),
        col("c.dist").as("len1"))
    val closedOf = chosen
      .join(openLines.withColumn("_open", lit(true)), Seq("line_id"),
        "left")
      .select(col("line_id"), col("tail"), col("len1"),
        col("_open").isNull.as("closed"))

    val kept = ranked.join(arcs, "aid")
      .join(sidLine, "sid")
      .join(closedOf, Seq("line_id", "tail"))
    val enters = kept.select(col("level"), col("line_id"),
      (col("len1") - col("dist")).as("pos"),
      col("ix").as("x"), col("iy").as("y"), col("closed"))
    val tailExit = kept.filter(col("dist") === 0)
      .select(col("level"), col("line_id"), (col("len1") + 1).as("pos"),
        col("ox").as("x"), col("oy").as("y"), col("closed"))
    enters.unionByName(tailExit)
  }

  /** WKT LINESTRING serialization of [[orderedVertices]] output:
    * (level, line_id, n_pts, closed, wkt). Coordinates format with the
    * repo's single WKT convention ([[graft.vector.Vectorize.fmtCoord]]:
    * integer-valued doubles collapse to integer literals; everything
    * else is Java Double.toString, which Spark's string cast emits) so
    * contour lines and building outlines stay byte-consistent.
    *
    * Scale shape: one hash aggregate per line; each line's vertices
    * sort INSIDE its aggregate value (bounded by line length, the same
    * per-feature bound as Vectorize's per-component walk). Lines longer
    * than `maxPts` vertices are refused honestly (null wkt, real
    * n_pts) instead of silently truncated. */
  def toWktLines(verts: DataFrame, maxPts: Int = 100000): DataFrame = {
    def fmt(c: Column): Column =
      when(c === floor(c) && abs(c) < 1e15,
        c.cast("long").cast("string")).otherwise(c.cast("string"))
    val vs = col("vs")
    verts
      .groupBy("level", "line_id", "closed")
      .agg(sort_array(collect_list(struct(col("pos"), col("x"),
        col("y")))).as("vs"))
      .select(col("level"), col("line_id"), size(vs).as("n_pts"),
        col("closed"),
        when(size(vs) <= maxPts,
          concat(lit("LINESTRING ("),
            concat_ws(", ", transform(vs,
              v => concat(fmt(v("x")), lit(" "), fmt(v("y"))))),
            lit(")")))
          .otherwise(lit(null).cast("string")).as("wkt"))
  }

  /** Dissolve segments into polylines: adds `line_id` = the minimum
    * segment id of the connected polyline (per level). Connectivity is
    * the exact shared-edge key, closed by the pointer-jumping
    * components loop — no float math anywhere. */
  def polylines(segs: DataFrame, levels: Seq[Long]): DataFrame = {
    require(levels.size < 32, "polyline ids pack < 32 levels")
    val spark = segs.sparkSession
    import spark.implicits._
    val lvlIdx = broadcast(
      levels.zipWithIndex.map { case (t, i) => (t, i.toLong) }
        .toDF("level", "li"))
    // pin the id-tagged segment table ONCE: it is consumed three times
    // below (both endpoint selects of the union + the final relabel
    // join), and its lineage is the full marching-squares chain — the
    // splat, the block aggregate, and the level explode used to run up
    // to three times per call
    val withId = segs.join(lvlIdx, "level")
      .withColumn("sid",
        segId(col("li"), col("bx"), col("by"), col("seg")))
      .localCheckpoint(eager = true)
    polylinesOf(withId)
  }

  /** [[polylines]] over an already-materialized id-tagged segment table
    * (columns: level, bx, by, seg, sid, e1o..e2y) — the shared core that
    * lets [[orderedVertices]] reuse its pinned `base` instead of
    * re-deriving the segments from scratch. */
  private def polylinesOf(withId: DataFrame): DataFrame = {
    val spark = withId.sparkSession
    import spark.implicits._
    // each endpoint: (level, edge key, segment id)
    val ends = withId.select(col("level"), col("e1o").as("eo"),
        col("e1x").as("ex"), col("e1y").as("ey"), col("sid"))
      .union(withId.select(col("level"), col("e2o"), col("e2x"),
        col("e2y"), col("sid")))
    // an edge joins at most its two adjacent blocks' segments
    val pairs = ends.as("a")
      .join(ends.as("b"), Seq("level", "eo", "ex", "ey"))
      .filter($"a.sid" < $"b.sid")
      .select($"a.sid".as("sa"), $"b.sid".as("sb"))
    val comp = DupClusters.components(pairs)
    withId.join(comp, withId("sid") === comp("id"), "left")
      .select(col("level"), col("bx"), col("by"), col("seg"),
        coalesce(col("cluster"), col("sid")).as("line_id"))
  }
}
