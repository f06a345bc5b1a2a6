package graft

import graft.api.Flagship
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR plus the flagship throughput pipeline, prints ONE
  * JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session warm-up so the first measured query doesn't pay JIT/codegen
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong
    val flag = Flagship.run(spark, nDocs)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + flag.seconds
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""flagship":{"docs":${flag.docs},"sec":${flag.seconds},""" +
        s""""docs_per_sec":${flag.docsPerSec},"pip_hits":${flag.pipHits},""" +
        s""""grid_cells":${flag.gridCells},"checksum":${flag.gridChecksum}},""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
