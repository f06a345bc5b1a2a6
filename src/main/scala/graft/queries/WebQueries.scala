package graft.queries

import graft.core.Quant
import graft.grid.Gridding
import graft.index.{CellFunctions, Cells}
import graft.ingest.WebPages
import graft.join.{Aoi, SpatialJoins}
import org.apache.spark.sql.functions._

/**
 * The north-star flagship over the generated Common-Crawl-shaped table:
 * pages -> url-dedup (latest capture) -> geocode -> H3/S2 cell encode ->
 * PIP join vs the AOI set -> DSM max-grid.
 *
 * Both queries STAGE the generated + geocoded page table to a parquet
 * side-table (like the flagship bench does) so the DuckDB duals replay
 * the dedup, PIP predicates, cell index, and grid aggregation bit-exactly
 * over the same bytes. Only the xxhash64 url-geocode itself is taken as
 * staged input (DuckDB has no xxhash64); the geocode->cell arithmetic is
 * SQL-checked on the documents table (q_geocode_cell / q_cell_hist).
 */
object WebQueries {

  /** url -> (lon, lat, z) via xxhash64 — deterministic, engine-side. */
  def withGeo(pages: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    pages.withColumn("h", abs(xxhash64(col("url"))))
      .withColumn("lon", (col("h") % 360000L) / lit(1000.0) - lit(180.0))
      .withColumn("lat", (col("h") / 360000L % 170000L) / lit(1000.0) - lit(85.0))
      .withColumn("z", (col("h") / 61200000000L % 20000L) / lit(1000.0))
      .drop("h")

  private val N = 4000L
  private val CellRes = 10

  /** Fixed side-table root the oracle SQL reads back (overwritten by the
    * engine queries before the oracle executes). */
  final val SideRoot = "/tmp/graft_webpages_side"

  /** Generate, geocode, stage to parquet, and read back — the engine
    * query consumes the same staged bytes the oracle replays. */
  private def stagedPages(s: org.apache.spark.sql.SparkSession) = {
    val pages = withGeo(WebPages.generate(s, N).toDF())
      .select("url", "warc_ts", "text", "lang", "lon", "lat", "z")
    pages.write.mode("overwrite").parquet(s"$SideRoot/pages")
    s.read.parquet(s"$SideRoot/pages")
  }

  /** Dedup CTE shared by both duals — WebPages.latestCapture's exact
    * (warc_ts desc, md5(text) desc) winner per url. */
  private val dedupCte =
    s"""pages AS (SELECT * FROM '$SideRoot/pages/*.parquet'),
       |ranked AS (SELECT *, row_number() OVER (
       |    PARTITION BY url ORDER BY warc_ts DESC, md5(text) DESC) AS rn
       |  FROM pages),
       |d AS (SELECT * FROM ranked WHERE rn = 1)""".stripMargin

  val q_webpages_dedup: QueryDef = QueryDef.sqlChecked(
    "q_webpages_dedup",
    s"""WITH $dedupCte
       |SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS domain,
       |  count(*) AS n_urls, max(length(text)) AS max_text_len
       |FROM d GROUP BY domain ORDER BY domain""".stripMargin) { (s, dir) =>
    val deduped = WebPages.latestCapture(stagedPages(s))
    deduped.withColumn("domain", regexp_extract(col("url"), "https://([^/]+)/", 1))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"), max(length(col("text"))).as("max_text_len"))
      .orderBy(col("domain"))
  }

  val q_webpages_pipeline: QueryDef = {
    val aoiHits = Aoi.defs.map(a =>
      s"SELECT ${a.aoiId} AS aoi_id FROM d WHERE ${a.oracleSqlPredicate}")
      .mkString("\n  UNION ALL ")
    QueryDef.sqlChecked(
      "q_webpages_pipeline",
      s"""WITH $dedupCte,
         |hits AS (
         |  $aoiHits),
         |aoi_counts AS (SELECT aoi_id, count(*) AS n_docs FROM hits GROUP BY aoi_id),
         |cells AS (SELECT ${Cells.packSql(Cells.cxSql("lon", CellRes),
              Cells.cySql("lat", CellRes), CellRes)} AS cell FROM d),
         |base AS (SELECT ${Quant.qSql("z")} AS qz,
         |  ${Gridding.bxSql("lon")} AS bx, ${Gridding.bySql("lat")} AS by FROM d),
         |splat AS (SELECT qz, bx + dx AS gx, by + dy AS gy
         |  FROM base CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) sp(dx, dy)),
         |dsm AS (SELECT gx, gy FROM splat GROUP BY gx, gy)
         |SELECT aoi_id, n_docs FROM aoi_counts
         |UNION ALL SELECT -1 AS aoi_id, count(DISTINCT cell) AS n_docs FROM cells
         |UNION ALL SELECT -2 AS aoi_id, count(*) AS n_docs FROM dsm
         |ORDER BY aoi_id""".stripMargin) { (s, dir) =>
      val pages = WebPages.latestCapture(stagedPages(s))
        .withColumn("doc_id", xxhash64(col("url"))) // id for the PIP output
      val hits = SpatialJoins.pointInPolygon(s, pages
          .select(col("doc_id"), col("lon"), col("lat")), Aoi.defs)
      val withCell = pages
        .withColumn("cell", CellFunctions.cellId(col("lon"), col("lat"), CellRes))
      val dsm = Gridding.dsm(Gridding.points(pages))
      // one materialized summary row set: per-AOI hit counts + grid size
      val aoiCounts = hits.groupBy("aoi_id").agg(count(lit(1)).as("n_docs"))
      val summary = aoiCounts
        .unionByName(withCell.agg(lit(-1).as("aoi_id"),
          countDistinct(col("cell")).as("n_docs")))
        .unionByName(dsm.agg(lit(-2).as("aoi_id"), count(lit(1)).as("n_docs")))
      summary.orderBy(col("aoi_id"))
    }
  }

  val all: Seq[QueryDef] = Seq(q_webpages_dedup, q_webpages_pipeline)
}
