package graft.queries

import graft.core.Tables
import graft.sketch.Sketches
import org.apache.spark.sql.functions._

/**
 * Mergeable-sketch aggregates over the documents table. The driver
 * oracle leans on the exactness contract: a theta sketch is EXACT below
 * its nominal k = 2^lgK distinct entries (every test SF keeps per-lang
 * distinct texts far under the default 4096), so both the direct
 * aggregate and the stored-sketch rollup must equal DuckDB's
 * `count(DISTINCT ...)` bit-for-bit. The estimation regime (> k) is
 * pinned by SketchSpec's tolerance + merge-invariance cases instead.
 */
object SketchQueries {

  /** Per-lang distinct text counts, twice: directly from the raw rows,
    * and re-rolled-up from per-(lang, source) STORED sketches — the
    * profile-table pattern where coarser groupings never re-touch raw
    * data. Both columns must equal the oracle's exact distinct count. */
  val q_theta_rollup: QueryDef = QueryDef.sqlChecked(
    "q_theta_rollup",
    """SELECT lang, count(DISTINCT text) AS n_direct,
      |  count(DISTINCT text) AS n_rollup
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val direct = docs.groupBy("lang")
      .agg(Sketches.thetaDistinct(col("text")).as("n_direct"))
    val rolled = docs.groupBy("lang", "source")
      .agg(Sketches.thetaSketch(col("text")).as("sk"))
      .groupBy("lang")
      .agg(Sketches.thetaUnionDistinct(col("sk")).as("n_rollup"))
    direct.join(rolled, Seq("lang")).orderBy(col("lang"))
  }

  val all: Seq[QueryDef] = Seq(q_theta_rollup)
}
