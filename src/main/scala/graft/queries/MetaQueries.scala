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
  final val Root = SideTables.root("snap_side")

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
  final val DiffRoot = SideTables.root("snap_diff")

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
  final val PruneRoot = SideTables.root("snap_prune")

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
  final val CompactRoot = SideTables.root("snap_compact")

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

  /** Own root (same isolation argument as [[DiffRoot]]). */
  final val MergeRoot = SideTables.root("snap_merge")

  /** Row-level MERGE (Iceberg-style copy-on-write upsert + delete,
    * [[Snapshots.merge]]): commit a doc summary table key-clustered
    * across 8 files, UPSERT a source batch (updates to existing keys +
    * brand-new keys), then DELETE a key subset, and read the table back
    * through the latest manifest. The DuckDB dual recomputes the final
    * state relationally (base anti-join upserts ∪ upserts, minus the
    * deleted keys), so the green row certifies the whole
    * discover-touched-files → rewrite → hard-link-untouched → commit
    * chain loses, duplicates, and corrupts nothing. The query fn itself
    * asserts the COW actually engaged: the upsert touches only the
    * key-range files the source hits, so at least one data FILE NAME
    * must carry over (a linked, unrewritten file) and at least one must
    * be new. */
  val q_snapshot_merge: QueryDef = QueryDef.sqlChecked(
    "q_snapshot_merge",
    s"""WITH mx AS (SELECT max(doc_id) AS m FROM documents),
       |base AS (SELECT doc_id, lang, n_chars FROM documents),
       |ups AS (
       |  SELECT doc_id, 'xx' AS lang, n_chars + 1000000 AS n_chars
       |  FROM documents, mx WHERE doc_id % 4 = 0 AND doc_id * 8 < m
       |  UNION ALL
       |  SELECT doc_id + m + 1 AS doc_id, 'yy' AS lang, n_chars
       |  FROM documents, mx WHERE doc_id % 16 = 0),
       |merged AS (
       |  SELECT b.* FROM base b LEFT JOIN ups u ON u.doc_id = b.doc_id
       |  WHERE u.doc_id IS NULL
       |  UNION ALL SELECT * FROM ups)
       |SELECT doc_id, lang, n_chars FROM merged
       |WHERE doc_id % 7 <> 3
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    QueryDef.recreateDir(MergeRoot)
    def fileNames(path: String): Set[String] =
      new java.io.File(path).listFiles.map(_.getName)
        .filter(_.endsWith(".parquet")).toSet
    val docs = Tables.documents(s, dir)
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    Snapshots.commitClustered(base, MergeRoot, "docs", s"docs:$dir",
      orderCols = Seq("doc_id"), statCols = Seq("doc_id"), numFiles = 8)
    // upserts localized to the LOW key octile (touches only the first of
    // the 8 key-range files) + inserts beyond max(doc_id) (new file) —
    // both MERGE branches fire and most files must survive as links
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val ups = docs.where(col("doc_id") % 4 === 0 && col("doc_id") * 8 < maxId)
      .select(col("doc_id"), lit("xx").as("lang"),
        (col("n_chars") + 1000000L).as("n_chars"))
      .unionByName(docs.where(col("doc_id") % 16 === 0)
        .select((col("doc_id") + maxId + 1).as("doc_id"), lit("yy").as("lang"),
          col("n_chars")))
    val m0 = Snapshots.latest(MergeRoot, "docs").get
    val m1 = Snapshots.merge(s, MergeRoot, "docs", ups, Seq("doc_id"))
    val (before, after) = (fileNames(m0.dataPath), fileNames(m1.dataPath))
    require((before & after).nonEmpty,
      "no untouched file carried over — COW rewrote the whole table")
    require((after -- before).nonEmpty, "merge wrote no new file")
    // delete pass: drop doc_id % 7 == 3 (source is key-only)
    val delKeys = s.read.parquet(m1.dataPath)
      .where(col("doc_id") % 7 === 3).select("doc_id")
    val m2 = Snapshots.merge(s, MergeRoot, "docs", delKeys, Seq("doc_id"),
      deleteMatched = true)
    require(m2.rows < m1.rows, s"delete removed nothing: ${m1.rows} -> ${m2.rows}")
    Snapshots.read(s, Snapshots.latest(MergeRoot, "docs").get)
      .orderBy(col("doc_id"))
  }

  val all: Seq[QueryDef] =
    Seq(q_snapshot_scan, q_snapshot_diff, q_snapshot_prune, q_snapshot_compact,
      q_snapshot_merge)
}
