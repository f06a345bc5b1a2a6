package graft.queries

import graft.core.{Geo, Tables}
import graft.grid.Gridding
import graft.meta.Snapshots
import org.apache.spark.sql.functions._

/**
 * Snapshot sink/scan (SURVEY.md §2.1 S2/S3 + §2.12 resume): the engine's
 * raster persistence is a cell-table parquet write behind an atomic
 * manifest commit. The roundtrip query materializes the DSM THROUGH the
 * snapshot store — commit (S3), then read back via the latest manifest
 * (S2) — while the DuckDB dual recomputes the grid from the raw
 * documents, so a corruption anywhere in the write/manifest/read path
 * breaks the bit-exact compare.
 */
object MetaQueries {

  /** Fixed snapshot root, wiped per run so the commit is always snap-0. */
  final val Root = "/tmp/graft_snap_side"

  val q_snapshot_scan: QueryDef = QueryDef.sqlChecked(
    "q_snapshot_scan",
    s"""WITH ${Gridding.splatCte}
       |SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy
       |ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    QueryDef.recreateDir(Root)
    val dsm = Gridding.dsm(Gridding.points(Geo.withGeo(Tables.documents(s, dir))))
    Snapshots.commit(dsm, Root, "dsm", lineage = s"dsm:$dir")
    val m = Snapshots.latest(Root, "dsm").get
    // resume must hit the just-committed snapshot, not recompute
    val (resumed, hit) = Snapshots.resumeOrCompute(s, Root, "dsm",
      lineage = s"dsm:$dir")(sys.error("resume missed a matching snapshot"))
    require(hit && m.snapshotId == 0L, s"unexpected snapshot state: $m hit=$hit")
    resumed.orderBy(col("gx"), col("gy"))
  }

  /** Own root — q_snapshot_scan wipes [[Root]] wholesale, and query
    * execution order is not part of the driver contract. */
  final val DiffRoot = "/tmp/graft_snap_diff"

  /** Incremental snapshot read (§2.12 resume + Iceberg-style CDC): commit
    * the DSM of half the corpus (even doc_ids) as snapshot 0 and of the
    * full corpus as snapshot 1, then ask the store for the change set
    * between the two states. The DuckDB dual recomputes both grids from
    * the raw documents and takes the same labeled EXCEPTs, so manifest
    * resolution, both committed data paths, and the diff transform are
    * all under the bit-exact compare. */
  val q_snapshot_diff: QueryDef = QueryDef.sqlChecked(
    "q_snapshot_diff",
    s"""WITH ${Gridding.splatCte},
       |g0 AS (SELECT gx, gy, max(qz) AS v FROM splat
       |       WHERE doc_id % 2 = 0 GROUP BY gx, gy),
       |g1 AS (SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy)
       |SELECT * FROM (
       |  SELECT 'delete' AS change, gx, gy, v
       |  FROM (SELECT * FROM g0 EXCEPT SELECT * FROM g1)
       |  UNION ALL
       |  SELECT 'insert' AS change, gx, gy, v
       |  FROM (SELECT * FROM g1 EXCEPT SELECT * FROM g0))
       |ORDER BY change, gx, gy, v""".stripMargin) { (s, dir) =>
    QueryDef.recreateDir(DiffRoot)
    val docs = Tables.documents(s, dir)
    def grid(d: org.apache.spark.sql.DataFrame) =
      Gridding.dsm(Gridding.points(Geo.withGeo(d)))
    Snapshots.commit(grid(docs.where(col("doc_id") % 2 === 0)),
      DiffRoot, "dsm", lineage = s"dsm-even:$dir")
    Snapshots.commit(grid(docs), DiffRoot, "dsm", lineage = s"dsm-all:$dir")
    Snapshots.diff(s, DiffRoot, "dsm", fromId = 0L, toId = 1L)
      .orderBy(col("change"), col("gx"), col("gy"), col("v"))
  }

  /** Own root (see [[DiffRoot]] note). */
  final val PruneRoot = "/tmp/graft_snap_prune"

  /** Data-skipping file pruning (Iceberg-style, SURVEY.md §4.7): commit
    * the cell-indexed documents CLUSTERED on the Morton cell id (range
    * partitioning -> disjoint per-file cell intervals + parquet footer
    * stats in `_filestats`), then probe one Morton quadrant of the id
    * space through [[Snapshots.readPruned]]. The query REQUIRES that
    * pruning actually skipped files — a quadrant probe over 8
    * range-partitioned files must not read all 8 — so the driver row
    * being green certifies both halves: the pruned scan loses no rows
    * (bit-exact vs the DuckDB dual recomputing cells from the raw
    * documents) and the stats actually engage. At the 100 TB design
    * point this is the difference between a cell-range query touching
    * ~range/fileSpan files and a full-table scan. */
  val q_snapshot_prune: QueryDef = {
    import graft.index.Cells
    val res = Spatial.Res
    // one Morton quadrant (top two interleaved bits = 01): a quarter of
    // the 2*res-bit id space, i.e. the lon<0 / lat>=0 world quadrant
    val lo = (res.toLong << 56) | (1L << (2 * res - 2))
    val hi = (res.toLong << 56) | ((1L << (2 * res - 1)) - 1)
    QueryDef.sqlChecked(
      "q_snapshot_prune",
      s"""WITH pts AS (SELECT doc_id, n_chars, ${Geo.lonSql("doc_id")} AS lon,
         |  ${Geo.latSql("doc_id")} AS lat FROM documents),
         |cxy AS (SELECT doc_id, n_chars, lon, lat,
         |  ${Cells.cxSql("lon", res)} AS cx, ${Cells.cySql("lat", res)} AS cy FROM pts),
         |cells AS (SELECT doc_id, n_chars,
         |  ${Cells.packSql("cx", "cy", res)} AS cell FROM cxy)
         |SELECT doc_id, n_chars, cell FROM cells
         |WHERE cell BETWEEN $lo AND $hi ORDER BY doc_id""".stripMargin) { (s, dir) =>
      QueryDef.recreateDir(PruneRoot)
      val cells = Geo.withGeo(Tables.documents(s, dir))
        .withColumn("cell",
          graft.index.CellFunctions.cellId(col("lon"), col("lat"), res))
        .select("doc_id", "n_chars", "cell")
      Snapshots.commitClustered(cells, PruneRoot, "cells", s"cells:$dir",
        orderCols = Seq("cell"), statCols = Seq("cell"), numFiles = 8)
      val (df, rep) = Snapshots.readPruned(s, PruneRoot, "cells", "cell", lo, hi)
      require(rep.keptFiles < rep.totalFiles,
        s"footer pruning did not engage: read ${rep.keptFiles}/${rep.totalFiles} files")
      df.select("doc_id", "n_chars", "cell").orderBy(col("doc_id"))
    }
  }

  /** Own root (same isolation argument as [[DiffRoot]]). */
  final val CompactRoot = "/tmp/graft_snap_compact"

  /** Small-file compaction roundtrip: commit the DSM fragmented across
    * 16 files, compact to 2, and read the table back through the LATEST
    * manifest — which must now be the compaction snapshot. The DuckDB
    * dual recomputes the grid from the raw documents, so the green row
    * certifies the rewrite lost/duplicated nothing; the query fn itself
    * asserts the file count actually shrank, the lineage records the
    * source id, and the pre-compaction snapshot stays time-travelable. */
  val q_snapshot_compact: QueryDef = QueryDef.sqlChecked(
    "q_snapshot_compact",
    s"""WITH ${Gridding.splatCte}
       |SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy
       |ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    QueryDef.recreateDir(CompactRoot)
    def parquetFiles(path: String): Int =
      new java.io.File(path).listFiles.count(_.getName.endsWith(".parquet"))
    val dsm = Gridding.dsm(Gridding.points(Geo.withGeo(Tables.documents(s, dir))))
    val frag = Snapshots.commit(dsm.repartition(16), CompactRoot, "dsm",
      lineage = s"dsm:$dir")
    val comp = Snapshots.compact(s, CompactRoot, "dsm", targetFiles = 2)
    require(comp.lineage == s"compact:${frag.snapshotId}", comp.lineage)
    require(parquetFiles(comp.dataPath) < parquetFiles(frag.dataPath),
      "compaction did not reduce the file count")
    require(Snapshots.at(CompactRoot, "dsm", frag.snapshotId).isDefined,
      "pre-compaction snapshot lost from history")
    val m = Snapshots.latest(CompactRoot, "dsm").get
    require(m.snapshotId == comp.snapshotId, s"latest is not the compaction: $m")
    Snapshots.read(s, m).orderBy(col("gx"), col("gy"))
  }

  val all: Seq[QueryDef] =
    Seq(q_snapshot_scan, q_snapshot_diff, q_snapshot_prune, q_snapshot_compact)
}
