package graft

/**
 * Dense single-threaded oracle for the classifyGround DTM loop
 * (graft.api.ClassifyGround) — an independent re-implementation of the
 * frozen re-spec over plain Maps, used by DtmSpec to pin the
 * distributed engine exactly. Mirrors pubgeo `shr3d.cpp:899-1013`
 * with the engine's documented deviations (per-object independent
 * fills, canonical chunk crop, in-bounds spike neighborhoods).
 */
object DtmOracle {

  type Grid = Map[(Long, Long), Int]
  type Pt = (Long, Long)

  /** FillVoids oracle (same spec as PyramidSpec's). */
  def fillVoids(cells: Grid, w: Int, h: Int, noSmoothing: Boolean,
                maxLevel: Int = 32): Grid = {
    def coarsen(g: Grid, w: Int, h: Int): Grid = {
      val cw = w / 2; val ch = h / 2
      (for (j <- 0L until cw; i <- 0L until ch) yield {
        val vs = for {
          dx <- -1 to 1; dy <- -1 to 1
          x = 2 * j + 1 + dx; y = 2 * i + 1 + dy
          if x >= 0 && x < w && y >= 0 && y < h
          v <- g.get((x, y))
        } yield v.toLong
        if (vs.isEmpty) None else Some((j, i) -> (vs.sum / vs.length).toInt)
      }).flatten.toMap
    }
    var levels = List((cells, w, h))
    var k = 0
    while (k < maxLevel && levels.head._2 / 2 >= 1 && levels.head._3 / 2 >= 1 &&
      levels.head._1.size < levels.head._2.toLong * levels.head._3) {
      val (g, lw, lh) = levels.head
      levels ::= ((coarsen(g, lw, lh), lw / 2, lh / 2))
      k += 1
    }
    var filled = levels.head._1
    for ((g, lw, lh) <- levels.tail) {
      val out = scala.collection.mutable.Map[Pt, Int]() ++ g
      for (x <- 0L until lw; y <- 0L until lh; if !g.contains((x, y))) {
        if (noSmoothing) filled.get((x / 2, y / 2)).foreach(v => out((x, y)) = v)
        else {
          val wvs = for {
            (dx, dy, wt) <- Seq((-1, -1, 1), (0, -1, 2), (1, -1, 1), (-1, 0, 2),
              (0, 0, 4), (1, 0, 2), (-1, 1, 1), (0, 1, 2), (1, 1, 1))
            v <- filled.get((x / 2 + dx, y / 2 + dy))
          } yield (wt.toLong, wt.toLong * v)
          if (wvs.nonEmpty) out((x, y)) = (wvs.map(_._2).sum / wvs.map(_._1).sum).toInt
        }
      }
      filled = out.toMap
    }
    filled
  }

  /** W13 reference-clamped boundary seeds over a dense grid. */
  def boundarySeeds(dtm: Grid, w: Int, h: Int, dz: Int, dh: Int): Set[Pt] = {
    def cx(v: Long) = math.min(math.max(0L, v), w - 1L)
    def cy(v: Long) = math.min(math.max(0L, v), h - 1L)
    val dirs = Seq((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1))
    dtm.keySet.filter { case (x, y) =>
      val me = dtm((x, y))
      me != 0 && dirs.exists { case (dx, dy) =>
        val n1 = dtm.getOrElse((cx(x + dx * dh), cy(y + dy * dh)), 0)
        n1 != 0 && {
          val n2 = dtm.getOrElse((cx(x + 2L * dx * dh), cy(y + 2L * dy * dh)), 0)
          (me - n1) - (n1 - n2) > dz
        }
      }
    }
  }

  /** W14 reference extension rounds (dh rounds of mark+resolve). */
  def extend(dtm: Grid, seeds: Set[Pt], w: Int, h: Int,
                     dz: Int, dh: Int): Set[Pt] = {
    var lbl = seeds
    for (_ <- 0 until dh) {
      val temp = (for {
        ((x, y), dv) <- dtm.iterator
        if !lbl((x, y))
        if (for { dx <- -1 to 1; dy <- -1 to 1; if dx != 0 || dy != 0 }
          yield (x + dx, y + dy)).exists { case (nx, ny) =>
          nx >= 1 && nx < w - 1 && ny >= 1 && ny < h - 1 && lbl((nx, ny)) &&
            2 * (dtm((nx, ny)) - dv) < dz
        }
      } yield (x, y)).toSet
      val promoted = temp.filter { case (x, y) =>
        val dv = dtm((x, y))
        (for {
          dx <- -1 to 1; dy <- -1 to 1; if dx != 0 || dy != 0
          nx = x + dx; ny = y + dy
          if nx >= 0 && nx < w && ny >= 0 && ny < h
          nv <- dtm.get((nx, ny))
          if nv != 0
        } yield nv).exists(nv => 2 * (dv - nv) > dz)
      }
      lbl = lbl ++ promoted
    }
    lbl
  }

  /** G2: 8-connected BFS with |dz| constraint + canonical chunk crop. */
  def components(cells: Set[Pt], dtm: Grid, dz: Int, w: Int,
                         maxCount: Long): Seq[Set[Pt]] = {
    val seen = scala.collection.mutable.Set[Pt]()
    val comps = scala.collection.mutable.ArrayBuffer[Set[Pt]]()
    for (start <- cells.toSeq.sortBy(c => c._2 * w + c._1); if !seen(start)) {
      val comp = scala.collection.mutable.ArrayBuffer[Pt]()
      val q = scala.collection.mutable.Queue(start)
      seen += start
      while (q.nonEmpty) {
        val cur = q.dequeue(); comp += cur
        for (dx <- -1 to 1; dy <- -1 to 1; if dx != 0 || dy != 0) {
          val n = (cur._1 + dx, cur._2 + dy)
          if (cells(n) && !seen(n) &&
            math.abs(dtm(n) - dtm(cur)) <= dz) {
            seen += n; q.enqueue(n)
          }
        }
      }
      comps ++= comp.sortBy(c => c._2 * w + c._1)
        .grouped(maxCount.toInt).map(_.toSet)
    }
    comps.toSeq
  }

  /** G5 fillObjectBounds per object (independent-union re-spec). */
  def fillObject(obj: Set[Pt], dtm: Grid, w: Int, h: Int,
                         rad: Int): Set[Pt] = {
    val xmin = obj.map(_._1).min; val xmax = obj.map(_._1).max
    val ymin = obj.map(_._2).min; val ymax = obj.map(_._2).max
    val j1 = math.max(0L, ymin - 1); val j2 = math.min(ymax + 1, h - 1L)
    val i1 = math.max(0L, xmin - 1); val i2 = math.min(xmax + 1, w - 1L)
    def dv(x: Long, y: Long) = dtm.getOrElse((x, y), 0)
    def colBounds(c: Long): Option[(Long, Long)] = {
      val rows = (j1 to j2).filter(j => obj((c, j)))
      if (rows.isEmpty) None else Some((rows.min, rows.max))
    }
    val ledge = if (xmin - 1 <= 0) colBounds(0) else None
    val redge = if (xmax + 1 >= w - 1) colBounds(w - 1L) else None
    val state = scala.collection.mutable.Map[Pt, Int]() // 1 IN_ONE 2 ACC 3 TEMP
    for (j <- j1 to j2) {
      val start: Long =
        if (ledge.exists(b => j >= b._1 && j <= b._2)) 0L
        else (i1 to i2).find(i => obj((i, j))).getOrElse(-1L)
      if (start >= 0) {
        val stop: Long =
          if (redge.exists(b => j >= b._1 && j <= b._2)) w - 1L
          else (i1 to i2).reverse.find(i => obj((i, j))).getOrElse(-1L)
        if (!(start == 0 && stop == w - 1)) {
          val ground =
            if (start == 0) dv(stop + 1, j)
            else if (stop == w - 1) dv(start - 1, j)
            else math.max(dv(start - 1, j), dv(stop + 1, j))
          for (i <- start to stop; if dv(i, j) > ground && !obj((i, j)))
            state((i, j)) = 1
        }
      }
    }
    for (i <- i1 to i2) colBounds(i).foreach { case (start, stop) =>
      if (!(start == 0 && stop == h - 1)) {
        val ground =
          if (start == 0) dv(i, stop + 1)
          else if (stop == h - 1) dv(i, start - 1)
          else math.max(dv(i, start - 1), dv(i, stop + 1))
        for (j <- start to stop
             if dv(i, j) > ground && (obj((i, j)) || state.get((i, j)).contains(1)))
          state((i, j)) = 2
      }
    }
    // NB: .iterator before .collect — collecting (x, y) pairs straight
    // off a Map rebuilds a Map and silently collapses cells sharing an x
    val accepted = state.iterator.collect { case (p, 2) => p }.toSeq
    for ((x, y) <- accepted; dx <- -rad to rad; dy <- -rad to rad) {
      val p = (x + dx, y + dy)
      if (p._1 >= 0 && p._1 < w && p._2 >= 0 && p._2 < h &&
        !state.get(p).contains(2)) state(p) = 3
    }
    val ex1 = math.max(0L, xmin - rad - 1); val ex2 = math.min(xmax + rad + 1, w - 1L)
    val ey1 = math.max(0L, ymin - rad - 1); val ey2 = math.min(ymax + rad + 1, h - 1L)
    state.iterator.collect {
      case (p, s) if s == 1 || s == 2 ||
        (s == 3 && p._1 >= ex1 && p._1 <= ex2 && p._2 >= ey1 && p._2 <= ey2) => p
    }.toSet
  }

  /** Full classifyGround loop; returns (dtm, voidMask). */
  def classifyGround(minGrid: Grid, solidDsm: Grid, w: Int, h: Int, dz: Int,
                     dh: Int, iters: Int, maxCount: Long): (Grid, Set[Pt]) = {
    var dtm = fillVoids(minGrid, w, h, noSmoothing = true)
    var voidMask = Set.empty[Pt]
    for (k <- 0 until iters) {
      val seeds = boundarySeeds(dtm, w, h, dz, dh)
      val labeled = extend(dtm, seeds, w, h, dz, dh)
      val objs = components(labeled, dtm, dz, w, maxCount)
      voidMask ++= objs.flatMap(o => fillObject(o, dtm, w, h, dh))
      dtm = fillVoids(dtm -- voidMask, w, h, noSmoothing = k < iters - 1)
    }
    // DSM restore
    val restoredPts = dtm.keySet.filter { p =>
      solidDsm.get(p).exists(sv => dtm(p) >= sv)
    }
    dtm = dtm ++ restoredPts.map(p => p -> solidDsm(p))
    voidMask --= restoredPts
    // W12 spikes (engine SpikeFilter semantics: in-bounds non-void nbrs;
    // border cells self-alias in the reference's clamped loop and are
    // never spiked)
    val spikes = dtm.keySet.filter { case (x, y) =>
      val me = dtm((x, y))
      me != 0 && x != 0 && y != 0 && x != w - 1 && y != h - 1 && {
        val diffs = for {
          dx <- -1 to 1; dy <- -1 to 1; if dx != 0 || dy != 0
          nx = x + dx; ny = y + dy
          if nx >= 0 && nx < w && ny >= 0 && ny < h
          nv <- dtm.get((nx, ny))
          if nv != 0
        } yield math.max(0, me - nv)
        diffs.nonEmpty && diffs.min > dz / 2
      }
    }
    voidMask ++= spikes
    (fillVoids(dtm -- voidMask, w, h, noSmoothing = false), voidMask)
  }
}
