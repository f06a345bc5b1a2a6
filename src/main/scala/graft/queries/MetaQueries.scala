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
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    rm(new java.io.File(Root))
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
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    rm(new java.io.File(DiffRoot))
    val docs = Tables.documents(s, dir)
    def grid(d: org.apache.spark.sql.DataFrame) =
      Gridding.dsm(Gridding.points(Geo.withGeo(d)))
    Snapshots.commit(grid(docs.where(col("doc_id") % 2 === 0)),
      DiffRoot, "dsm", lineage = s"dsm-even:$dir")
    Snapshots.commit(grid(docs), DiffRoot, "dsm", lineage = s"dsm-all:$dir")
    Snapshots.diff(s, DiffRoot, "dsm", fromId = 0L, toId = 1L)
      .orderBy(col("change"), col("gx"), col("gy"), col("v"))
  }

  val all: Seq[QueryDef] = Seq(q_snapshot_scan, q_snapshot_diff)
}
