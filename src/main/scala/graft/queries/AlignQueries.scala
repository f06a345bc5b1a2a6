package graft.queries

import graft.align.Align3d
import graft.core.{Geo, Tables}
import org.apache.spark.sql.functions._

/** ALIGN3D as a driver-visible query: the geocoded doc points are the
  * reference; the target is the same cloud with a known injected shift.
  * Output is one row with the recovered translation (rows-only check —
  * the full offset-search semantics are covered by AlignSpec; the result
  * is deterministic by construction). */
object AlignQueries {

  val q_align_offset: QueryDef = QueryDef.rowsOnly("q_align_offset") { (s, dir) =>
    import s.implicits._
    // local metric-ish frame from a dense doc subregion
    val pts = Geo.withGeo(Tables.documents(s, dir))
      .select((col("lon") * 10.0).as("x"), (col("lat") * 10.0).as("y"), col("z"))
    // inject exactly (+2, -1) grid cells and +0.5 m
    val tgt = pts.select((col("x") + 240.0).as("x"), (col("y") - 120.0).as("y"),
      (col("z") + 0.5).as("z"))
    // doc z is high-variance (not smooth terrain): open up the edge
    // filter so the DSMs keep their cells
    val cfg = Align3d.Config(gsd = 120.0, maxT = 360.0, numSamples = 2000,
      maxDzMeters = 25.0)
    val (res, _) = Align3d.run(s, pts, tgt, cfg)
    Seq((res.tx, res.ty, res.tz, res.rmsMeters, res.completeness, res.nValid))
      .toDF("tx", "ty", "tz", "rms_m", "completeness", "n_valid")
  }

  val all: Seq[QueryDef] = Seq(q_align_offset)
}
