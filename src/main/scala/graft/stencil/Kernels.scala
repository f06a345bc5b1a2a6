package graft.stencil

import graft.stencil.TileStencil.Kernel

/**
 * The reference's stencil family (SURVEY.md §2.5), re-specified over the
 * sparse int cell table. 0 is void. All neighborhoods are the in-bounds
 * subset of the (2r+1)^2 block (the reference clamps its loop bounds at
 * the image edge, pubgeo `src/common/Image.h:144-153` — neighbors are
 * never duplicated, just omitted).
 */
object Kernels {

  /** Iterate in-bounds neighbors incl. center unless skipCenter. */
  @inline private def foreachNeighbor(
      get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int, r: Int,
      skipCenter: Boolean)(f: Int => Unit): Unit = {
    var yy = math.max(y - r, 0)
    val yMax = math.min(y + r, h - 1)
    val xMin = math.max(x - r, 0)
    val xMax = math.min(x + r, w - 1)
    while (yy <= yMax) {
      var xx = xMin
      while (xx <= xMax) {
        if (!(skipCenter && xx == x && yy == y)) f(get(xx, yy))
        xx += 1
      }
      yy += 1
    }
  }

  /** W3 quantileFilter (pubgeo `orthoimage.h:546-566`): replace the cell
    * with the neighborhood quantile value iff it differs from the cell
    * by more than dz. Void neighbors skipped; quantile index
    * ix = min(floor(q*n), n-1) over the sorted non-void neighborhood
    * (center included, as in the reference's window). Void cells stay
    * void. */
  final case class QuantileFilter(radius: Int, q: Double, dz: Int) extends Kernel {
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      val buf = new scala.collection.mutable.ArrayBuffer[Int](
        (2 * radius + 1) * (2 * radius + 1))
      foreachNeighbor(get, x, y, w, h, radius, skipCenter = false) { v =>
        if (v != 0) buf += v
      }
      if (buf.isEmpty) return me
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val ix = math.min(math.floor(q * arr.length).toInt, arr.length - 1)
      val qv = arr(ix)
      if (math.abs(qv - me) > dz) qv else me
    }
  }

  def medianFilter(radius: Int, dz: Int): QuantileFilter = QuantileFilter(radius, 0.5, dz)

  /** W4 minFilter / erosion (pubgeo `orthoimage.h:569-578`): replace with
    * the neighborhood min iff me > min + dz. Voids skipped. */
  final case class MinFilter(radius: Int, dz: Int) extends Kernel {
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      var mn = Int.MaxValue
      foreachNeighbor(get, x, y, w, h, radius, skipCenter = false) { v =>
        if (v != 0 && v < mn) mn = v
      }
      if (mn != Int.MaxValue && me > mn + dz) mn else me
    }
  }

  /** W5 maxFilter / dilation (pubgeo `orthoimage.h:581-590`). */
  final case class MaxFilter(radius: Int, dz: Int) extends Kernel {
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      var mx = 0
      foreachNeighbor(get, x, y, w, h, radius, skipCenter = false) { v =>
        if (v > mx) mx = v
      }
      if (me + dz < mx) mx else me
    }
  }

  /** W6 edgeFilter (pubgeo `orthoimage.h:592-600`): void the cell if ANY
    * neighbor (voids NOT skipped — absent = 0) differs by more than dz.
    * Used to trim unreliable DSM borders before alignment
    * (`align3d.cpp:225`). */
  final case class EdgeFilter(dz: Int) extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      var kill = false
      foreachNeighbor(get, x, y, w, h, 1, skipCenter = true) { v =>
        if (math.abs(v - me) > dz) kill = true
      }
      if (kill) 0 else me
    }
  }

  /** W7 well filter (pubgeo `shr3d.cpp:107-111`): void if >= 4 of the 8
    * neighbors exceed the cell by `rise`. */
  final case class WellFilter(rise: Int) extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      var n = 0
      foreachNeighbor(get, x, y, w, h, 1, skipCenter = true) { v =>
        if (v != 0 && v > me + rise) n += 1
      }
      if (n >= 4) 0 else me
    }
  }

  /** W12 spike removal (pubgeo `shr3d.cpp:975-994`): the cell is a spike
    * if min over the 8 non-void neighbors of max(0, me - ngbr) exceeds
    * dz/2 — i.e. it pokes above ALL its neighbors.
    *
    * Border parity with the reference: its neighbor indices are clamped
    * per-axis (`MAX(0, MIN(dim-1, …))`), so every border cell aliases to
    * itself (diff 0) and can NEVER be a spike — replicated here by
    * keeping border cells unconditionally.
    *
    * Documented deviations from the C++ scan (also noted in
    * ClassifyGround's determinism note): (1) the reference zeroes spikes
    * in-place mid-scan, so a zeroed cell can cascade into its scan-order
    * successors; this kernel evaluates all cells against the SAME input
    * grid (deterministic, partitioning-independent — a sequential
    * cascade has no parallel equivalent). (2) a non-void cell whose
    * neighbors are ALL void keeps its value here, while the reference's
    * raw diffs against 0 would spike it. */
  final case class SpikeFilter(dz: Int) extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      if (x == 0 || y == 0 || x == w - 1 || y == h - 1) return me
      var mn = Int.MaxValue
      foreachNeighbor(get, x, y, w, h, 1, skipCenter = true) { v =>
        if (v != 0) { val d = math.max(0, me - v); if (d < mn) mn = d }
      }
      if (mn != Int.MaxValue && mn > dz / 2) 0 else me
    }
  }

  /** W9 class-edge fill (pubgeo `shr3d.cpp:476-487`): a TREE cell with
    * any BUILDING neighbor whose DSM value is within dz becomes
    * BUILDING. Two-grid stencil over values packed as
    * (cls << 17) | dsmRaw (dsmRaw < 2^17); run it `iterations` times. */
  final case class ClassEdgeFill(dz: Int, dh: Int, tree: Int, bldg: Int) extends Kernel {
    val radius: Int = dh
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      val cls = me >>> 17
      if (cls != tree) return me
      val dv = me & 0x1FFFF
      var hit = false
      foreachNeighbor(get, x, y, w, h, dh, skipCenter = true) { n =>
        if (n != 0 && (n >>> 17) == bldg && math.abs((n & 0x1FFFF) - dv) <= dz)
          hit = true
      }
      if (hit) (bldg << 17) | dv else me
    }
  }

  /** W10 majority filter (pubgeo `shr3d.cpp:489-493`) over a class mask
    * (building = bldg code, other non-void codes pass through): a
    * non-building cell flips to building when buildings hold at least
    * half of the in-bounds neighbor POSITIONS (absent cells count as
    * non-building, like the reference's void class). */
  final case class MajorityFilter(bldg: Int) extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0 || me == bldg) return me
      var nb = 0; var positions = 0
      foreachNeighbor(get, x, y, w, h, 1, skipCenter = true) { v =>
        positions += 1
        if (v == bldg) nb += 1
      }
      if (2 * nb >= positions) bldg else me
    }
  }

  /** W13 boundary gradient detector (pubgeo `shr3d.cpp:592-624`): mark
    * the cell (value 1) when in any of the 8 directions the
    * slope-corrected step (me - n1) - (n1 - n2) exceeds dz, probing at
    * strides dh and 2*dh; both probes must be non-void and in-bounds.
    * Unmarked cells are dropped (void). */
  final case class BoundaryGradient(dz: Int, dh: Int) extends Kernel {
    val radius: Int = 2 * dh
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      val dirs = Array((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1))
      var i = 0
      while (i < dirs.length) {
        val (dx, dy) = dirs(i)
        val x1 = x + dx * dh; val y1 = y + dy * dh
        val x2 = x + 2 * dx * dh; val y2 = y + 2 * dy * dh
        if (x2 >= 0 && x2 < w && y2 >= 0 && y2 < h) {
          val n1 = get(x1, y1); val n2 = get(x2, y2)
          if (n1 != 0 && n2 != 0 && (me - n1) - (n1 - n2) > dz) return 1
        }
        i += 1
      }
      0
    }
  }

  /** W14 boundary extension (pubgeo `shr3d.cpp:536-589`), one relaxation
    * round = two kernel passes over values packed as
    * (label << 17) | dsmRaw with label in {0 = unlabeled, 1 = object,
    * 2 = TEMP}:
    *  - phase 1 [[ExtendMark]]: an unlabeled cell adjacent to an OBJECT
    *    cell at |dz| <= dz becomes TEMP;
    *  - phase 2 [[ExtendResolve]]: TEMP becomes OBJECT if it sits higher
    *    than some neighbor, else reverts to unlabeled.
    * Run the pair edgeResolution times. */
  final case class ExtendMark(dz: Int) extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0 || (me >>> 17) != 0) return me
      val dv = me & 0x1FFFF
      var mark = false
      foreachNeighbor(get, x, y, w, h, 1, skipCenter = true) { n =>
        if (n != 0 && (n >>> 17) == 1 && math.abs((n & 0x1FFFF) - dv) <= dz)
          mark = true
      }
      if (mark) (2 << 17) | dv else me
    }
  }

  final case class ExtendResolve() extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0 || (me >>> 17) != 2) return me
      val dv = me & 0x1FFFF
      var higher = false
      foreachNeighbor(get, x, y, w, h, 1, skipCenter = true) { n =>
        if (n != 0 && dv > (n & 0x1FFFF)) higher = true
      }
      if (higher) (1 << 17) | dv else dv
    }
  }

  /** W13 boundary gradient, reference-clamped variant
    * (pubgeo `shr3d.cpp:592-624` exactly): probes at strides dh and 2*dh
    * in the 8 directions with each coordinate clamped to the image
    * independently (so border cells probe shortened/aliased strides like
    * the reference, instead of skipping the direction); mark (1) when
    * n1 is non-void and (me - n1) - (n1 - n2) > dz. Unmarked -> void. */
  final case class RefBoundaryGradient(dz: Int, dh: Int) extends Kernel {
    val radius: Int = 2 * dh
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      @inline def cx(v: Int) = math.min(math.max(0, v), w - 1)
      @inline def cy(v: Int) = math.min(math.max(0, v), h - 1)
      val me = get(x, y)
      val dirs = Array((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1))
      var i = 0
      while (i < dirs.length) {
        val (dx, dy) = dirs(i)
        val n1 = get(cx(x + dx * dh), cy(y + dy * dh))
        if (n1 != 0) {
          val n2 = get(cx(x + 2 * dx * dh), cy(y + 2 * dy * dh))
          if ((me - n1) - (n1 - n2) > dz) return 1
        }
        i += 1
      }
      0
    }
  }

  /** W14 boundary extension, reference-exact pair
    * (pubgeo `shr3d.cpp:536-589`), over values packed as
    * (label << 17) | dtmRaw with label in {0 = ground, 1 = object,
    * 2 = TEMP}; run the pair dhBins times:
    *  - [[RefExtendMark]]: a non-object cell becomes TEMP when some
    *    INTERIOR 8-neighbor n is an object with
    *    dtm(n) - dtm(me) < dz/2 (the float half-compare done exactly
    *    in integers as 2*diff < dz);
    *  - [[RefExtendResolve]]: TEMP becomes object when the cell sits
    *    higher than some in-bounds 3x3 neighbor by more than dz/2,
    *    else reverts to ground. */
  final case class RefExtendMark(dz: Int) extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0 || (me >>> 17) == 1) return me
      val dv = me & 0x1FFFF
      var yy = y - 1
      while (yy <= y + 1) {
        var xx = x - 1
        while (xx <= x + 1) {
          // the reference's phase-1 centers are interior cells only
          if (xx >= 1 && xx < w - 1 && yy >= 1 && yy < h - 1 &&
            !(xx == x && yy == y)) {
            val n = get(xx, yy)
            if (n != 0 && (n >>> 17) == 1 && 2 * ((n & 0x1FFFF) - dv) < dz)
              return (2 << 17) | dv
          }
          xx += 1
        }
        yy += 1
      }
      me
    }
  }

  final case class RefExtendResolve(dz: Int) extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0 || (me >>> 17) != 2) return me
      val dv = me & 0x1FFFF
      var higher = false
      foreachNeighbor(get, x, y, w, h, 1, skipCenter = true) { n =>
        if (n != 0 && 2 * (dv - (n & 0x1FFFF)) > dz) higher = true
      }
      if (higher) (1 << 17) | dv else dv
    }
  }

  /** W15 label erode+dilate pass (pubgeo `shr3d.cpp:1091-1139` exactly),
    * as a two-kernel pipeline over the 0/1 label MASK (this is mask
    * morphology on labels, NOT value morphology — a labeled cell
    * survives iff some in-bounds 3x3 neighborhood cell, itself
    * included, survived erosion; erosion keeps a cell iff every
    * in-bounds 3x3 neighbor is labeled):
    *  1. [[MaskErodePack]]: mask cell -> 3 when it survives erosion
    *     (bit0 = mask, bit1 = eroded), else 1;
    *  2. [[MaskOpenResolve]]: mask cell -> 1 when any in-bounds 3x3
    *     cell (incl. self) carries bit1, else void (removed). */
  final case class MaskErodePack() extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      var allIn = true
      foreachNeighbor(get, x, y, w, h, 1, skipCenter = true) { v =>
        if (v == 0) allIn = false
      }
      if (allIn) 3 else 1
    }
  }

  final case class MaskOpenResolve() extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      var any = (me & 2) != 0
      foreachNeighbor(get, x, y, w, h, 1, skipCenter = true) { v =>
        if ((v & 2) != 0) any = true
      }
      if (any) 1 else 0
    }
  }

  /** Horn 3x3 gradient magnitude (L1) over the quantized DSM — the
    * classic slope operator every DSM product family ships next to the
    * reference's dzdx/dzdy boundary gradients (pubgeo `shr3d.cpp`
    * computes first differences for W13; Horn 1981 is the 8-neighbor
    * generalization). Integer throughout: gx = (ne+2e+se)-(nw+2w+sw),
    * gy = (sw+2s+se)-(nw+2n+ne), out = |gx|+|gy|. Cells missing any of
    * the 8 neighbors (image border or void) are voided — the operator
    * reports slope only where the full stencil support exists, the same
    * convention a production slope raster uses for nodata. Flat cells
    * (|gx|+|gy| = 0) void too (0 IS the void encoding of the sparse
    * table); the oracle applies the same filter. */
  case object HornGradient extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      if (get(x, y) == 0) return 0
      if (x - 1 < 0 || x + 1 >= w || y - 1 < 0 || y + 1 >= h) return 0
      val nw = get(x - 1, y - 1); val n = get(x, y - 1); val ne = get(x + 1, y - 1)
      val wv = get(x - 1, y); val ev = get(x + 1, y)
      val sw = get(x - 1, y + 1); val s = get(x, y + 1); val se = get(x + 1, y + 1)
      if (nw == 0 || n == 0 || ne == 0 || wv == 0 || ev == 0 ||
        sw == 0 || s == 0 || se == 0) return 0
      val gx = (ne + 2 * ev + se) - (nw + 2 * wv + sw)
      val gy = (sw + 2 * s + se) - (nw + 2 * n + ne)
      math.abs(gx) + math.abs(gy)
    }
  }

  /** Aspect as steepest-descent direction: the 1-based index (in the
    * fixed (dx,dy) enumeration below — row-major, center skipped) of the
    * strictly-lowest 8-neighbor, ties to the smallest index. Same
    * full-support convention as [[HornGradient]]; cells that are local
    * minima or flat (no neighbor strictly below) void — a drainage /
    * flow-direction primitive (D8, O'Callaghan & Mark 1984). */
  case object AspectD8 extends Kernel {
    val radius = 1
    final val Offsets: Seq[(Int, Int)] =
      Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      if (x - 1 < 0 || x + 1 >= w || y - 1 < 0 || y + 1 >= h) return 0
      var bestIdx = 0
      var bestV = me
      var i = 0
      while (i < 8) {
        val (dx, dy) = Offsets(i)
        val v = get(x + dx, y + dy)
        if (v == 0) return 0 // full support required
        if (v < bestV) { bestV = v; bestIdx = i + 1 }
        i += 1
      }
      bestIdx
    }
  }

  /** 8-neighbor Laplacian curvature: 8*center - sum(neighbors) — the
    * integer discrete Laplacian, sign-flipped so ridges/spikes read
    * positive and pits negative (profile-curvature / TPI proxy; Wilson &
    * Gallant 2000 ch.3 use the same window). Full support required like
    * [[HornGradient]]; exactly-flat cells (value 0) fall out of the
    * sparse table per the void convention, so duals filter `<> 0` on
    * both sides. Signed output — the sparse cell table carries any
    * non-zero int. */
  case object Laplacian extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      if (x - 1 < 0 || x + 1 >= w || y - 1 < 0 || y + 1 >= h) return 0
      var s = 0L
      var i = 0
      while (i < 8) {
        val (dx, dy) = AspectD8.Offsets(i)
        val v = get(x + dx, y + dy)
        if (v == 0) return 0 // full support required
        s += v
        i += 1
      }
      (8L * me - s).toInt
    }
  }

  /** Terrain Ruggedness Index (Riley, DeGloria & Elliot 1999), integer
    * form: sum of |center - neighbor| over the 8-neighborhood. Full
    * support required; perfectly smooth cells (TRI 0) void per the
    * sparse convention (duals filter both sides). */
  case object Ruggedness extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      if (x - 1 < 0 || x + 1 >= w || y - 1 < 0 || y + 1 >= h) return 0
      var s = 0L
      var i = 0
      while (i < 8) {
        val (dx, dy) = AspectD8.Offsets(i)
        val v = get(x + dx, y + dy)
        if (v == 0) return 0 // full support required
        s += math.abs(me.toLong - v)
        i += 1
      }
      s.toInt
    }
  }

  /** W8 tree filter over var = DSM - MIN (pubgeo `shr3d.cpp:140-164`):
    * void the cell if its var is <= maxTree but no 3x3 neighbor's var is
    * below the dz threshold (vegetation canopy detector). Voids not
    * skipped (absent var = 0 counts as below-threshold). */
  final case class TreeFilter(maxTree: Int, dz: Int) extends Kernel {
    val radius = 1
    def apply(get: (Int, Int) => Int, x: Int, y: Int, w: Int, h: Int): Int = {
      val me = get(x, y)
      if (me == 0) return 0
      if (me > maxTree) return me
      var anyLow = false
      foreachNeighbor(get, x, y, w, h, 1, skipCenter = true) { v =>
        if (v <= dz) anyLow = true
      }
      if (anyLow) me else 0
    }
  }
}
