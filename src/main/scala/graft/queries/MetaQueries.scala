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

  val all: Seq[QueryDef] = Seq(q_snapshot_scan)
}
