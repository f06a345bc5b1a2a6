package graft

/**
 * Dense single-threaded replica of the reference's label-image + boundary
 * trace semantics, used as the oracle for RefTrace:
 *  - two-pass CCL with DisjointSet merge-to-smaller + ascending-root
 *    renumbering (pubgeo `src/common/Image.h:255-326`,
 *    `src/common/disjoint_set.h:59-121`): foreground 8-connected with
 *    positive labels from 1, background 4-connected with negative labels,
 *    edge-connected background 0;
 *  - radial-sweep boundary walk (`src/common/geo_polygon.h:152-204`);
 *  - traceBoundaries scan + hole attachment (`geo_polygon.h:219-243`):
 *    each label traced from its row-major first pixel, holes attached to
 *    the label above their first pixel in ascending-negative-label
 *    (std::map) order.
 */
object RefTraceOracle {

  type Pt = (Long, Long)

  private class DS {
    val p = scala.collection.mutable.ArrayBuffer[Int]()
    def add(): Int = { p += p.length; p.length - 1 }
    def find(i: Int): Int = {
      var r = i
      while (p(r) != r) r = p(r)
      var c = i
      while (p(c) != r) { val n = p(c); p(c) = r; c = n }
      r
    }
    def merge(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra < rb) p(rb) = ra else if (rb < ra) p(ra) = rb
    }
    def flatten(minLabel: Int): Array[Int] = {
      var next = minLabel
      val out = new Array[Int](p.length)
      for (i <- p.indices) {
        val j = find(i)
        out(i) = if (j == i) { val v = next; next += 1; v } else out(j)
      }
      out
    }
  }

  /** mask(row)(col) -> label image: fg > 0, holes < 0, edge-bg 0. */
  def labelImage(mask: Array[Array[Boolean]]): Array[Array[Int]] = {
    val hgt = mask.length
    val wid = if (hgt == 0) 0 else mask(0).length
    val fg = new DS
    val bg = new DS
    bg.add() // exterior background label 0
    val lab = Array.ofDim[Int](hgt, wid)
    for (j <- 0 until hgt; i <- 0 until wid) {
      val ngbrs = scala.collection.mutable.SortedSet[Int]()
      if (mask(j)(i)) {
        if (j > 0) {
          if (i > 0 && mask(j - 1)(i - 1)) ngbrs += lab(j - 1)(i - 1)
          if (mask(j - 1)(i)) ngbrs += lab(j - 1)(i)
          if (i < wid - 1 && mask(j - 1)(i + 1)) ngbrs += lab(j - 1)(i + 1)
        }
        if (i > 0 && mask(j)(i - 1)) ngbrs += lab(j)(i - 1)
        if (ngbrs.isEmpty) lab(j)(i) = fg.add()
        else {
          val l = ngbrs.head
          lab(j)(i) = l
          ngbrs.foreach(fg.merge(_, l))
        }
      } else {
        if (j == 0 || j == hgt - 1 || i == 0 || i == wid - 1) ngbrs += 0
        if (j > 0 && !mask(j - 1)(i)) ngbrs += lab(j - 1)(i)
        if (i > 0 && !mask(j)(i - 1)) ngbrs += lab(j)(i - 1)
        if (ngbrs.isEmpty) lab(j)(i) = bg.add()
        else {
          val l = ngbrs.head
          lab(j)(i) = l
          ngbrs.foreach(bg.merge(_, l))
        }
      }
    }
    val fgF = fg.flatten(1)
    val bgF = bg.flatten(0)
    for (j <- 0 until hgt; i <- 0 until wid)
      lab(j)(i) = if (mask(j)(i)) fgF(lab(j)(i)) else -bgF(lab(j)(i))
    lab
  }

  /** Radial-sweep walk over the label image from (row r, col c); returns
    * the unclosed CW ring of (col, row) coords. */
  def walkImage(lab: Array[Array[Int]], r: Int, c: Int): Vector[Pt] = {
    val hgt = lab.length
    val wid = if (hgt == 0) 0 else lab(0).length
    val v = lab(r)(c)
    val dj = Array(1, 1, 0, -1, -1, -1, 0, 1)
    val di = Array(0, -1, -1, -1, 0, 1, 1, 1)
    val stride = if (v > 0) 1 else 2
    var m = r
    var n = c
    var firstDir = -1
    var lastDir = 0
    val ring = scala.collection.mutable.ArrayBuffer[Pt]()
    while (true) {
      ring += ((n.toLong, m.toLong))
      val finDir = (lastDir + 4) % 8
      var newDir = (lastDir + 6) % 8
      var found = false
      while (!found && newDir != finDir) {
        val p = m + dj(newDir)
        val q = n + di(newDir)
        if (p >= 0 && p < hgt && q >= 0 && q < wid && lab(p)(q) == v) found = true
        else newDir = (newDir + stride) % 8
      }
      if (newDir == finDir && ring.length == 1) return ring.toVector
      else if (m == r && n == c && newDir == firstDir) {
        ring.remove(ring.length - 1)
        return ring.toVector
      } else if (firstDir < 0) firstDir = newDir
      m += dj(newDir)
      n += di(newDir)
      lastDir = newDir
    }
    sys.error("unreachable")
  }

  /** traceBoundaries: fg label -> (outer ring, inner rings in reference
    * attachment order). */
  def trace(lab: Array[Array[Int]]): Map[Int, (Vector[Pt], Vector[Vector[Pt]])] = {
    val hgt = lab.length
    val wid = if (hgt == 0) 0 else lab(0).length
    val rings = scala.collection.mutable.LinkedHashMap[Int, Vector[Pt]]()
    val holeOwner = scala.collection.mutable.Map[Int, Int]()
    for (j <- 0 until hgt; i <- 0 until wid) {
      val v = lab(j)(i)
      if (v != 0 && !rings.contains(v)) {
        rings(v) = walkImage(lab, j, i)
        if (v < 0) holeOwner(v) = lab(j - 1)(i)
      }
    }
    val out = scala.collection.mutable.Map[Int, (Vector[Pt], Vector[Vector[Pt]])]()
    for ((v, ring) <- rings if v > 0) out(v) = (ring, Vector.empty)
    // std::map<negative label> iterates ascending = most negative first
    for (hv <- holeOwner.keys.toSeq.sorted) {
      val owner = holeOwner(hv)
      val (o, inners) = out(owner)
      out(owner) = (o, inners :+ rings(hv))
    }
    out.toMap
  }

  /** Expected WKT for a traced polygon, matching RefTrace.toWkt. */
  def wkt(outer: Vector[Pt], inners: Seq[Vector[Pt]]): String = {
    def ringStr(r: Vector[Pt]): String =
      (r :+ r.head).map(p => s"${p._1} ${p._2}").mkString("(", ", ", ")")
    (ringStr(outer) +: inners.map(ringStr)).mkString("POLYGON (", ", ", ")")
  }
}
