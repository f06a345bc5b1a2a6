package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Raster -> vector outlines (SURVEY.md §2.9; reference: boundary trace +
 * hole assignment + buildingSimplify, pubgeo
 * `src/common/geo_polygon.h:152-777`).
 *
 * This engine traces the edges of the union of unit cells (marching-
 * squares style) instead of the reference's Moore pixel walk: rings are
 * exactly closed, single-cell components and holes fall out uniformly,
 * and diagonal-only connections (8-connected components whose squares
 * touch at a point) become MULTIPOLYGON shells. Shells are CCW, holes
 * CW; every ring is then simplified: collinear-run merge always,
 * optional Visvalingam-Whyatt with a minimum triangle area (V3's
 * vwReduce, `geo_polygon.h:718-777`).
 *
 * Distribution: one row per (label, cell) -> groupByKey(label) ->
 * per-component pure-Scala trace in mapGroups. Per-group memory is
 * bounded by construction: component sizes are pre-aggregated and any
 * label above `maxCells` is REFUSED (emitted with its size and a null
 * wkt) instead of being materialized in one task — callers that need
 * bounded components chunk them upstream via ConnectedComponents'
 * maxCount cap (the reference's own region-cap semantics,
 * `shr3d.cpp:913`).
 */
object Vectorize {

  type Pt = (Long, Long)

  /** Directed boundary edges with interior on the left. */
  private def boundaryEdges(cells: Set[Pt]): Map[Pt, List[Pt]] = {
    val out = scala.collection.mutable.Map[Pt, List[Pt]]().withDefaultValue(Nil)
    def add(a: Pt, b: Pt): Unit = out(a) = b :: out(a)
    for ((x, y) <- cells) {
      if (!cells((x, y - 1))) add((x, y), (x + 1, y))         // bottom, +x
      if (!cells((x + 1, y))) add((x + 1, y), (x + 1, y + 1)) // right, +y
      if (!cells((x, y + 1))) add((x + 1, y + 1), (x, y + 1)) // top, -x
      if (!cells((x - 1, y))) add((x, y + 1), (x, y))         // left, -y
    }
    out.toMap
  }

  /** Link directed edges into closed rings. At 2-fan vertices
    * (checkerboard touch) prefer the left turn — keeps rings simple and
    * deterministic. */
  def rings(cells: Set[Pt]): Seq[Vector[Pt]] = {
    val edges = scala.collection.mutable.Map[Pt, List[Pt]]() ++ boundaryEdges(cells)
    val out = scala.collection.mutable.ArrayBuffer[Vector[Pt]]()
    while (edges.nonEmpty) {
      val start = edges.keys.minBy(p => (p._2, p._1))
      var cur = start
      var prev: Pt = null
      val ring = scala.collection.mutable.ArrayBuffer[Pt](start)
      var done = false
      while (!done) {
        val nexts = edges(cur)
        val next = if (nexts.size == 1 || prev == null) nexts.minBy(p => (p._2, p._1))
        else {
          // left turn preference relative to incoming direction
          val din = (cur._1 - prev._1, cur._2 - prev._2)
          nexts.maxBy { n =>
            val dout = (n._1 - cur._1, n._2 - cur._2)
            din._1 * dout._2 - din._2 * dout._1 // cross: left turn = +
          }
        }
        val rest = nexts.filterNot(_ == next)
        if (rest.isEmpty) edges.remove(cur) else edges(cur) = rest
        prev = cur
        cur = next
        if (cur == start) done = true else ring += cur
      }
      out ++= splitAtPinches(ring.toVector)
    }
    out.toSeq
  }

  /** A traced ring may pass through the same vertex twice (pinch at a
    * checkerboard configuration that is elsewhere-connected). Split such
    * rings into simple rings at the repeated vertex — the OGC-valid
    * representation (polygons touching at finitely many points). */
  private def splitAtPinches(ring: Vector[Pt]): Seq[Vector[Pt]] = {
    val firstIdx = scala.collection.mutable.Map[Pt, Int]()
    var i = 0
    while (i < ring.length) {
      firstIdx.get(ring(i)) match {
        case Some(j) =>
          val inner = ring.slice(j, i)
          val outer = ring.take(j) ++ ring.drop(i)
          return splitAtPinches(inner) ++ splitAtPinches(outer)
        case None =>
          firstIdx(ring(i)) = i
      }
      i += 1
    }
    Seq(ring)
  }

  def signedArea2(ring: Vector[Pt]): Long = {
    var s = 0L
    var i = 0
    while (i < ring.length) {
      val a = ring(i); val b = ring((i + 1) % ring.length)
      s += a._1 * b._2 - b._1 * a._2
      i += 1
    }
    s
  }

  /** Merge collinear runs (axis-aligned rings: drop middle points). */
  def mergeCollinear(ring: Vector[Double2]): Vector[Double2] = {
    if (ring.length < 3) return ring
    val n = ring.length
    (0 until n).collect {
      case i if {
        val p = ring((i - 1 + n) % n); val c = ring(i); val q = ring((i + 1) % n)
        val cross = (c._1 - p._1) * (q._2 - p._2) - (c._2 - p._2) * (q._1 - p._1)
        cross != 0.0
      } => ring(i)
    }.toVector
  }

  type Double2 = (Double, Double)

  /** Visvalingam-Whyatt: repeatedly drop the vertex forming the smallest
    * triangle while that area is below minArea (ring stays >= 4 pts).
    * Deterministic tie-break: smallest index. */
  def vwReduce(ring0: Vector[Double2], minArea: Double): Vector[Double2] = {
    var ring = ring0
    var changed = true
    while (changed && ring.length > 4) {
      changed = false
      val n = ring.length
      var bestI = -1
      var bestA = Double.MaxValue
      for (i <- 0 until n) {
        val p = ring((i - 1 + n) % n); val c = ring(i); val q = ring((i + 1) % n)
        val a = math.abs((c._1 - p._1) * (q._2 - p._2)
          - (c._2 - p._2) * (q._1 - p._1)) / 2.0
        if (a < bestA) { bestA = a; bestI = i }
      }
      if (bestA < minArea) {
        ring = ring.patch(bestI, Nil, 1)
        changed = true
      }
    }
    ring
  }

  /** V3 findCorners (pubgeo `geo_polygon.h:508-553`): a vertex is a
    * corner when its turn metric (pi - theta) * d1 * d2 reaches
    * pi * scale^2 / 8 (theta = interior angle via clamped acos, d1/d2 =
    * adjacent segment lengths); non-max suppression keeps only the
    * strongest corner within 5/6*scale of ring distance. Returns the
    * corner-only ring, or the input when fewer than 4 corners survive. */
  def cornerSimplify(ring: Vector[Double2], scale: Double): Vector[Double2] = {
    val n = ring.length
    if (n < 5) return ring
    def seg(a: Double2, b: Double2) = math.hypot(b._1 - a._1, b._2 - a._2)
    val metric = Array.tabulate(n) { i =>
      val p = ring((i - 1 + n) % n); val c = ring(i); val q = ring((i + 1) % n)
      val d1 = seg(p, c); val d2 = seg(c, q)
      if (d1 == 0 || d2 == 0) 0.0
      else {
        val dot = ((p._1 - c._1) * (q._1 - c._1) + (p._2 - c._2) * (q._2 - c._2)) / (d1 * d2)
        val theta = math.acos(math.max(-1.0, math.min(1.0, dot)))
        (math.Pi - theta) * d1 * d2
      }
    }
    val threshold = math.Pi * scale * scale / 8.0
    val isCorner = Array.tabulate(n)(i => metric(i) >= threshold)
    // non-max suppression along ring distance
    val window = 5.0 * scale / 6.0
    for (i <- 0 until n if isCorner(i)) {
      var dist = 0.0
      var j = (i + 1) % n
      while (dist < window && j != i) {
        dist += seg(ring((j - 1 + n) % n), ring(j))
        if (dist < window && isCorner(j)) {
          if (metric(j) > metric(i) || (metric(j) == metric(i) && j > i))
            isCorner(i) = false
          else isCorner(j) = false
        }
        j = (j + 1) % n
      }
    }
    val corners = (0 until n).filter(isCorner).map(ring).toVector
    if (corners.length >= 4) corners else ring
  }

  /** Component cells -> WKT MULTIPOLYGON (shells CCW + their holes).
    * `cornerScale` engages the buildingSimplify-style corner pass. */
  def toWkt(cells: Set[Pt], minArea: Double = 0.0,
            cornerScale: Double = 0.0): String = {
    val rs = rings(cells).map(r => r.map(p => (p._1.toDouble, p._2.toDouble)))
      .map(mergeCollinear)
      .map(r => if (cornerScale > 0) cornerSimplify(r, cornerScale) else r)
      .map(r => if (minArea > 0) vwReduce(r, minArea) else r)
    val (shells, holes) = rs.partition(r => signedAreaD(r) > 0)
    def inside(pt: Double2, ring: Vector[Double2]): Boolean = {
      // ray cast
      var c = false
      val n = ring.length
      var i = 0; var j = n - 1
      while (i < n) {
        val (xi, yi) = ring(i); val (xj, yj) = ring(j)
        if (((yi > pt._2) != (yj > pt._2)) &&
          (pt._1 < (xj - xi) * (pt._2 - yi) / (yj - yi) + xi)) c = !c
        j = i; i += 1
      }
      c
    }
    // probe strictly inside the hole: the void-cell center right of the
    // hole ring's first edge (hole rings have the void region on their
    // right). Half-integer coords never graze ring vertices -> the ray
    // cast is exact. Smallest containing shell wins (nesting).
    val shellsBySize = shells.zipWithIndex.sortBy { case (s, _) => math.abs(signedAreaD(s)) }
    val holeOf = holes.map { h =>
      val a = h.head; val b = h(1)
      val mid = ((a._1 + b._1) / 2.0, (a._2 + b._2) / 2.0)
      val d = (b._1 - a._1, b._2 - a._2)
      val probe = (mid._1 + 0.5 * d._2, mid._2 - 0.5 * d._1)
      val shell = shellsBySize.find { case (s, _) => inside(probe, s) }
      shell.map(_._2).getOrElse(0) -> h
    }
    def ringStr(r: Vector[Double2]): String =
      (r :+ r.head).map(p => s"${fmt(p._1)} ${fmt(p._2)}").mkString("(", ", ", ")")
    def fmt(d: Double): String = if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
    val polys = shells.zipWithIndex.map { case (s, i) =>
      val hs = holeOf.filter(_._1 == i).map(_._2)
      (ringStr(s) +: hs.map(ringStr)).mkString("(", ", ", ")")
    }
    s"MULTIPOLYGON (${polys.mkString(", ")})"
  }

  private def signedAreaD(ring: Vector[Double2]): Double = {
    var s = 0.0
    var i = 0
    while (i < ring.length) {
      val a = ring(i); val b = ring((i + 1) % ring.length)
      s += a._1 * b._2 - b._1 * a._2
      i += 1
    }
    s
  }

  /** Default per-component cell cap for [[outlines]] — the reference's
    * region cap 10000/gsd² at its finest documented gsd (0.05 m). */
  final val DefaultMaxCells = 4000000L

  /** Labeled cells (gx, gy, label) -> one WKT outline row per label.
    * Labels with more than `maxCells` cells are refused (null wkt, size
    * reported) rather than gathered into a single task. */
  def outlines(labeled: DataFrame, minArea: Double = 0.0,
               maxCells: Long = DefaultMaxCells): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val cells = labeled.select(col("gx").cast("long"), col("gy").cast("long"),
      col("label").cast("long"))
    val sizes = cells.groupBy("label").agg(count(lit(1)).as("n_cells"))
    val refused = sizes.filter(col("n_cells") > maxCells)
      .select(col("label"), col("n_cells"),
        lit(null).cast("string").as("wkt"))
    val traced = cells
      .join(sizes.filter(col("n_cells") <= maxCells).select("label"),
        Seq("label"), "left_semi")
      .select("gx", "gy", "label") // using-join moves the key first
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .mapGroups { (label, it) =>
        val cs = it.map(c => (c._1, c._2)).toSet
        (label, cs.size.toLong, toWkt(cs, minArea))
      }
      .toDF("label", "n_cells", "wkt")
    traced.unionByName(refused)
  }
}
