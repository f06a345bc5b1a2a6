package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All verifiable engine operations, each a Spark impl + (where SQL can
    * express it) a DuckDB oracle. */
  def defs: Seq[QueryDef] =
    Relational.all ++ Spatial.all ++ Joins.all ++ TextQueries.all ++
      SimilarityQueries.all ++ StencilQueries.all ++ CcQueries.all ++
      AlignQueries.all ++ Shr3dQueries.all ++ WebQueries.all ++
      GridQueries2.all ++ MorphQueries.all ++ QuantQueries.all ++
      MetaQueries.all ++ SketchQueries.all ++ TemporalQueries.all ++
      PipelineQueries.all ++ ContourQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * geocode -> cell index -> DSM max-grid (the SHR3D A1 analog). */
  def entry(spark: SparkSession): DataFrame =
    Spatial.q_dsm_grid.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
