package graft

import graft.api.Flagship
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR plus the flagship throughput pipeline and a
  * two-parallelism scaling protocol, prints ONE JSON line AND writes the
  * same line to SPARK_GRAFT_BENCH_OUT (default /root/repo/BENCH_LAST.json)
  * so downstream tooling never has to fish the line out of sbt noise.
  * Per-query failures are recorded in a "failed" list (and on stderr)
  * instead of being silently folded into the timings. */
object Bench {

  private def session(cpus: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** BASELINE.md scaling protocol, inline, on the north rule's N-vs-4N
    * pair (2 -> 8 cores — the regime where cores, not the box's memory
    * bandwidth, are the scaled resource; see BASELINE.md for the full
    * three-level warm table and the multi-JVM corroboration): identical
    * flagship job, 2 warm-ups + 3 timed per level, median docs/sec,
    * determinism asserted across levels via the grid checksum. */
  private def scalingBlock(nDocs: Long): String = {
    val levels = Seq(2, 8)
    val results = levels.map { cpus =>
      val s = session(cpus.toString)
      try {
        (1 to 2).foreach(_ => Flagship.run(s, nDocs)) // warm-up
        val runs = (1 to 3).map { _ => System.gc(); Flagship.run(s, nDocs) }
        val med = runs.map(_.seconds).sorted.apply(1)
        val chk = runs.map(_.gridChecksum).distinct
        require(chk.size == 1, s"non-deterministic checksum at local[$cpus]")
        cpus -> ((nDocs / med, med, chk.head))
      } finally s.stop()
    }.toMap
    val (dpsN, secN, chkN) = results(2)
    val (dps4N, sec4N, chk4N) = results(8)
    require(chkN == chk4N, "checksum differs across parallelism levels")
    val eff = dps4N.toDouble / (4.0 * dpsN.toDouble)
    s""""scaling":{"docs":$nDocs,"n2":{"sec":$secN,"docs_per_sec":$dpsN},""" +
      s""""n8":{"sec":$sec4N,"docs_per_sec":$dps4N},""" +
      s""""efficiency_2_8":$eff,"checksum":$chkN}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LAST.json")
    val spark = session(cpus)

    // session warm-up so the first measured query doesn't pay JIT/codegen
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case t: Throwable =>
            System.err.println(s"BENCH FAILURE in $name: ${t.getClass.getName}: ${t.getMessage}")
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }

    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong
    val flag = Flagship.run(spark, nDocs)
    spark.stop()

    // the scaling pair needs enough work per run that fixed stage
    // overheads don't drown the 8-core side (at 2M docs the 8-core run
    // is ~3 s and efficiency reads artificially low)
    val scalingDocs =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING_DOCS", "8000000").toLong
    val scaling =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING", "1") == "1")
        Some(scalingBlock(scalingDocs))
      else None

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum + flag.seconds
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":$failed,""" +
        s""""flagship":{"docs":${flag.docs},"sec":${flag.seconds},""" +
        s""""docs_per_sec":${flag.docsPerSec},"pip_hits":${flag.pipHits},""" +
        s""""grid_cells":${flag.gridCells},"checksum":${flag.gridChecksum}},""" +
        scaling.map(s => s + ",").getOrElse("") +
        s""""sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
  }
}
