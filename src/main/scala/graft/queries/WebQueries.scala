package graft.queries

import graft.grid.Gridding
import graft.index.CellFunctions
import graft.ingest.WebPages
import graft.join.{Aoi, SpatialJoins}
import org.apache.spark.sql.functions._

/**
 * The north-star flagship over the generated Common-Crawl-shaped table:
 * pages -> url-dedup (latest capture) -> geocode -> H3/S2 cell encode ->
 * PIP join vs the AOI set -> DSM max-grid. Inputs are generated
 * deterministically in-engine (FIXTURES.md F1), so these are rows-only
 * for the driver; the per-operator semantics are SQL-checked upstream
 * on the documents table.
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

  val q_webpages_dedup: QueryDef = QueryDef.rowsOnly("q_webpages_dedup") { (s, dir) =>
    val pages = WebPages.generate(s, N).toDF()
    val deduped = WebPages.latestCapture(pages)
    deduped.withColumn("domain", regexp_extract(col("url"), "https://([^/]+)/", 1))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"), max(length(col("text"))).as("max_text_len"))
      .orderBy(col("domain"))
  }

  val q_webpages_pipeline: QueryDef = QueryDef.rowsOnly("q_webpages_pipeline") { (s, dir) =>
    val pages = withGeo(WebPages.latestCapture(WebPages.generate(s, N).toDF()))
      .withColumn("doc_id", xxhash64(col("url"))) // id for the PIP output
    val hits = SpatialJoins.pointInPolygon(s, pages
        .select(col("doc_id"), col("lon"), col("lat")), Aoi.defs)
    val withCell = pages
      .withColumn("cell", CellFunctions.cellId(col("lon"), col("lat"), 10))
    val dsm = Gridding.dsm(Gridding.points(pages))
    // one materialized summary row set: per-AOI hit counts + grid size
    val aoiCounts = hits.groupBy("aoi_id").agg(count(lit(1)).as("n_docs"))
    val summary = aoiCounts
      .unionByName(withCell.agg(lit(-1).as("aoi_id"),
        countDistinct(col("cell")).as("n_docs")))
      .unionByName(dsm.agg(lit(-2).as("aoi_id"), count(lit(1)).as("n_docs")))
    summary.orderBy(col("aoi_id"))
  }

  val all: Seq[QueryDef] = Seq(q_webpages_dedup, q_webpages_pipeline)
}
