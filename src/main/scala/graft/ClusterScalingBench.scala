package graft

import graft.api.Flagship
import org.apache.spark.sql.SparkSession

/**
 * Multi-JVM corroboration of the BASELINE.md scaling protocol: the same
 * flagship job on a `local-cluster[N, coresPerWorker, memMB]` master —
 * real separate executor JVMs with real shuffle transport, removing the
 * single-JVM memory-bandwidth/GC coupling that depresses the in-process
 * local[8->32] pair. Env: SPARK_GRAFT_WORKERS, SPARK_GRAFT_WORKER_CORES,
 * SPARK_GRAFT_BENCH_DOCS. Requires SPARK_HOME (executor launcher).
 */
object ClusterScalingBench {
  def main(args: Array[String]): Unit = {
    val workers = sys.env.getOrElse("SPARK_GRAFT_WORKERS", "4").toInt
    val cores = sys.env.getOrElse("SPARK_GRAFT_WORKER_CORES", "8").toInt
    val memMb = sys.env.getOrElse("SPARK_GRAFT_WORKER_MB", "8192").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "4000000").toLong
    val spark = SparkSession.builder()
      .master(s"local-cluster[$workers,$cores,$memMb]")
      .config("spark.sql.shuffle.partitions", workers * cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        graft.core.SessionDefaults.ExcludedOptimizerRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory", s"${memMb - 1024}m")
      // executor JVMs are launched from SPARK_HOME and need the engine
      // classes for codegen that references graft.* (e.g. CellIdExpr)
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUPS", "3").toInt
    val timed = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    (1 to warmups).foreach(_ => Flagship.run(spark, nDocs))
    val runs = (1 to timed).map { _ => System.gc(); Flagship.run(spark, nDocs) }
    val med = runs.map(_.seconds).sorted.apply(timed / 2)
    val chk = runs.map(_.gridChecksum).distinct
    require(chk.size == 1, s"non-deterministic checksums: $chk")
    println(
      s"""{"mode":"local-cluster","workers":$workers,"cores_per_worker":$cores,""" +
        s""""docs":$nDocs,"runs_sec":[${runs.map(_.seconds).mkString(",")}],""" +
        s""""median_sec":$med,"docs_per_sec":${nDocs / med},"checksum":${chk.head}}""")
    spark.stop()
  }
}
