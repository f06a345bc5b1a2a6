package graft

import graft.cc.GridDbscan
import graft.stencil.TileStencil.Bounds
import org.apache.spark.sql.functions._

class GridDbscanSpec extends SparkSpec {
  import spark.implicits._

  private val W = 32

  /** Scalar reference: density over 3x3, core CCL by repeated min-label
    * sweeps, border = min adjacent core label. */
  private def ref(cells: Map[(Long, Long), Long], minPts: Long)
      : Map[(Long, Long), (Long, String, Option[Long])] = {
    def nbrs(c: (Long, Long)) =
      for (dx <- -1L to 1L; dy <- -1L to 1L) yield (c._1 + dx, c._2 + dy)
    val density = cells.map { case (c, _) =>
      c -> nbrs(c).flatMap(cells.get).sum }
    val core = cells.keySet.filter(c => density(c) >= minPts)
    var lbl = core.map(c => c -> (c._2 * W + c._1)).toMap
    var changed = true
    while (changed) {
      changed = false
      for (c <- core) {
        val m = (nbrs(c).filter(core) :+ c).map(lbl).min
        if (m < lbl(c)) { lbl += c -> m; changed = true }
      }
    }
    cells.map { case (c, _) =>
      if (core(c)) c -> (density(c), "core", Some(lbl(c)))
      else {
        val adj = nbrs(c).filter(core).map(lbl)
        if (adj.nonEmpty) c -> (density(c), "border", Some(adj.min))
        else c -> (density(c), "noise", None)
      }
    }
  }

  private def run(cells: Map[(Long, Long), Long], minPts: Long,
                  parts: Int = 1) = {
    val df = cells.toSeq.map { case ((x, y), n) => (x, y, n) }
      .toDF("gx", "gy", "cnt").repartition(parts)
    GridDbscan.cluster(df, Bounds(W, W), minPts, tileSize = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getString(4),
          Option(r.get(5)).map(_.asInstanceOf[Long])))
      .toMap
  }

  test("two blobs joined by a thin bridge split when the bridge is sparse") {
    // blob A around (2,2), blob B around (10,2), bridge cells count 1
    val blob = for (dx <- 0L to 2L; dy <- 0L to 2L) yield (dx, dy)
    val cells =
      blob.map { case (x, y) => (x + 1, y + 1) -> 3L }.toMap ++
      blob.map { case (x, y) => (x + 9, y + 1) -> 3L }.toMap ++
      Map((5L, 2L) -> 1L, (6L, 2L) -> 1L, (7L, 2L) -> 1L) ++
      Map((20L, 20L) -> 1L) // isolated noise
    val minPts = 12L
    val got = run(cells, minPts)
    val want = ref(cells, minPts)
    assert(got === want)
    // the two blobs carry distinct labels
    val labels = got.collect { case (_, (_, "core", Some(l))) => l }.toSet
    assert(labels.size === 2)
    assert(got((20L, 20L))._2 === "noise")
  }

  test("minPts sweep matches the scalar reference") {
    val cells = (for (x <- 0L until 12L; y <- 0L until 12L
      if (x * 31 + y * 17) % 3 != 0)
      yield (x, y) -> ((x * 7 + y * 13) % 4 + 1)).toMap
    for (minPts <- Seq(1L, 8L, 15L, 30L, 1000L)) {
      assert(run(cells, minPts) === ref(cells, minPts), s"minPts=$minPts")
    }
  }

  test("partitioning invariance") {
    val cells = (for (x <- 0L until 10L; y <- 0L until 10L if x != 5)
      yield (x, y) -> 2L).toMap
    assert(run(cells, 14L, parts = 1) === run(cells, 14L, parts = 13))
  }

  test("all-core single cluster and all-noise extremes") {
    val cells = (for (x <- 0L until 4L; y <- 0L until 4L)
      yield (x, y) -> 5L).toMap
    val allCore = run(cells, 1L)
    assert(allCore.values.forall(_._2 == "core"))
    assert(allCore.values.flatMap(_._3).toSet.size === 1)
    val allNoise = run(cells, 1000L)
    assert(allNoise.values.forall(v => v._2 == "noise" && v._3.isEmpty))
  }
}
