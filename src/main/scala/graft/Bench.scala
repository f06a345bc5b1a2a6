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
      .config("spark.sql.optimizer.excludedRules",
        graft.core.SessionDefaults.ExcludedOptimizerRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(s) // SQL surface on every engine session
    s
  }

  /** BASELINE.md scaling protocol on the north rule's N-vs-4N pair
    * (2 -> 8 cores — the regime where cores, not the box's memory
    * bandwidth, are the scaled resource; see BASELINE.md for the full
    * three-level warm table and the multi-JVM corroboration). Each
    * level runs [[ScalingBench]] (3 warm-ups + 5 timed, median) in a
    * FRESH fixed-heap child JVM — round 2 measured the pair inside one
    * reused JVM and GC debris from the 2-core runs depressed the 8-core
    * side to a sub-0.8 reading; a per-level fresh JVM is exactly what
    * tools/run_bench.sh measures and what a real spark-submit does.
    * Falls back to the in-process pair if the child can't launch. */
  private def scalingBlock(nDocs: Long): String = {
    val levels = Seq(2, 8)
    val results = levels.map { cpus =>
      forkedLevel(cpus, nDocs).map((_, "forked"))
        .getOrElse((inProcessLevel(cpus, nDocs), "inprocess"))
    }
    val Seq((n, nMode), (n4, n4Mode)) = results
    require(n.chk == n4.chk, "checksum differs across parallelism levels")
    val eff = n4.dps.toDouble / (4.0 * n.dps.toDouble)
    // best-of-5 efficiency: capability reading robust to noisy-neighbor
    // bursts hitting one level's median (both are emitted; BASELINE.md
    // documents the protocols)
    val effBest = (nDocs / n4.best) / (4.0 * (nDocs / n.best))
    // a level that fell back in-process makes the PAIR incomparable
    // (different JVM state than the forked protocol) — say so in the
    // artifact instead of letting the number stand unqualified
    val mixed = nMode != n4Mode
    s""""scaling":{"docs":$nDocs,"n2":{"sec":${n.med},"best_sec":${n.best},"docs_per_sec":${n.dps},"mode":"$nMode"},""" +
      s""""n8":{"sec":${n4.med},"best_sec":${n4.best},"docs_per_sec":${n4.dps},"mode":"$n4Mode"},""" +
      s""""efficiency_2_8":$eff,"efficiency_2_8_best":$effBest,""" +
      s""""protocol_mixed":$mixed,"checksum":${n.chk}}"""
  }

  /** One measured level of the warm protocol: median/best of 5 timed
    * runs after 3 warm-ups, plus the result invariants. */
  private final case class LevelStats(
      dps: Long, med: Double, best: Double, chk: Long, pip: Long, cells: Long)

  /** One scaling level in a fresh fixed-heap child JVM (the BASELINE.md
    * apparatus). Returns (docs/sec, median sec, best sec, checksum). */
  private def forkedLevel(cpus: Int, nDocs: Long): Option[LevelStats] =
    try {
      val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
        "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar")
        .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
      // the child's heap is its OWN protocol constant: inheriting the
      // parent's SPARK_DRIVER_MEM once sized two 48g fixed heaps on one
      // box and the local[2] level swapped its way past the fork
      // deadline — the fork must stay at the BASELINE.md 32g regardless
      // of how big the sweep JVM was started
      val mem = sys.env.getOrElse("SPARK_GRAFT_FORK_MEM", "32g")
      val cmd = (Seq("java") ++ opens ++ Seq(s"-Xmx$mem", s"-Xms$mem",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", System.getProperty("java.class.path"), "graft.ScalingBench"))
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_CPUS", cpus.toString)
      pb.environment().put("SPARK_GRAFT_BENCH_DOCS", nDocs.toString)
      // Spark logs flood stderr: discard it or the pipe buffer fills
      // and the child deadlocks before printing its stdout JSON line
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val proc = pb.start()
      // read stdout on a reaper thread with a hard deadline: a hung
      // child must not wedge the whole bench (it would also make the
      // in-process fallback unreachable)
      val out = new java.util.concurrent.atomic.AtomicReference(Vector.empty[String])
      val reader = new Thread(() =>
        out.set(scala.io.Source.fromInputStream(proc.getInputStream)
          .getLines().toVector))
      reader.setDaemon(true)
      reader.start()
      // 45 min default: the box this runs on can degrade ~3x under a
      // noisy neighbor (measured 2026-08-18: flagship 2.1 s -> 5.6 s
      // median on the same commit), and a killed fork silently degrades
      // the level to the in-process fallback — which mixes protocols and
      // once produced a >1 "efficiency". A slow fork is a better
      // artifact than a fast wrong one.
      val deadlineMin =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK_TIMEOUT_MIN", "45").toLong
      if (!proc.waitFor(deadlineMin, java.util.concurrent.TimeUnit.MINUTES)) {
        proc.destroyForcibly()
        System.err.println(s"BENCH: forked level local[$cpus] exceeded " +
          s"$deadlineMin min, killed — falling back to in-process")
        return None
      }
      reader.join(10000)
      val line = out.get().find(_.startsWith("{\"cpus\""))
      line.flatMap { l =>
        def num(k: String): Option[String] =
          s""""$k":(-?[0-9.]+)""".r.findFirstMatchIn(l).map(_.group(1))
        for {
          med <- num("median_sec").map(_.toDouble)
          chk <- num("checksum").map(_.toLong)
        } yield LevelStats((nDocs / med).toLong, med,
          num("best_sec").map(_.toDouble).getOrElse(med), chk,
          num("pip_hits").map(_.toLong).getOrElse(-1L),
          num("grid_cells").map(_.toLong).getOrElse(-1L))
      }
    } catch { case _: Throwable => None }

  /** Legacy in-process fallback (fresh session in THIS JVM). */
  private def inProcessLevel(cpus: Int, nDocs: Long): LevelStats = {
    val s = session(cpus.toString)
    try {
      (1 to 3).foreach(_ => Flagship.run(s, nDocs))
      val runs = (1 to 5).map { _ => System.gc(); Flagship.run(s, nDocs) }
      val med = runs.map(_.seconds).sorted.apply(2)
      val chk = runs.map(_.gridChecksum).distinct
      require(chk.size == 1, s"non-deterministic checksum at local[$cpus]")
      LevelStats((nDocs / med).toLong, med, runs.map(_.seconds).min, chk.head,
        runs.head.pipHits, runs.head.gridCells)
    } finally s.stop()
  }

  /** Queries per SparkSession during the sweep. One session across the
    * whole (now 80+) query list accumulates state the queries themselves
    * release only via GC — localCheckpoint blocks, cached plans,
    * broadcast cleanup backlog — and late-alphabet queries were measured
    * up to 5x slower than the same query alone (round-3 sweep:
    * q_webpages_dedup 1.7 s standalone vs 9.4 s at position 78).
    * Recycling bounds the debt so position in the sweep stops being a
    * confounder; each query still pays its own full cold plan+codegen. */
  private final val RecycleEvery = 16

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LAST.json")
    var spark = session(cpus)

    // session warm-up so the first measured query doesn't pay JIT/codegen
    def warm(): Unit = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    warm()

    // optional comma-separated query filter (profiling aid; the driver
    // never sets it, so the contract output is unchanged)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").filter(_.nonEmpty).toSet)
    // Each query is run twice in the same session and BOTH times are
    // reported: the first (cold) run pays plan + whole-stage-codegen +
    // JIT for every generated class the query touches, which for the
    // deep pipelines (q_fill_enclosed: CCL + stencil + enclosure test)
    // measured up to 10x the query's steady-state time AND varies with
    // the query's position relative to the session recycle boundary.
    // The warm (second) run is the per-query figure of merit — it is
    // what a long-lived executor JVM on a real cluster runs — while the
    // cold run keeps compile cost visible instead of hiding it.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .map { case ((name, fn), i) =>
      if (i > 0 && i % RecycleEvery == 0) {
        spark.stop()
        spark = session(cpus)
        warm()
      }
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case t: Throwable =>
              System.err.println(s"BENCH FAILURE in $name: ${t.getClass.getName}: ${t.getMessage}")
              false
          }
        // release blocks the finished query persisted (localCheckpoints):
        // they are dead after count() but only GC would reclaim them, and
        // accumulated blocks starve later queries' execution memory
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (cold, okCold) = once()
      val (warmSec, okWarm) = if (okCold) once() else (cold, false)
      (name, warmSec, cold, okCold && okWarm)
    }

    // Flagship throughput in a FRESH fixed-heap child JVM with the warm
    // protocol (3 warm-ups + 5 timed, median) — measured in this JVM
    // right after the 80-query sweep, the reading is dominated by the
    // sweep's accumulated GC/codegen debt (round 3 measured a 9x
    // distortion), not by the job. Sweep session is stopped first so the
    // child gets the whole machine.
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong
    // Pre-stage BOTH fork inputs at full parallelism while the sweep
    // session is still alive: stageInput reuses an existing _SUCCESS
    // path, so the forked children only read. Without this, a wiped /tmp
    // makes the local[2] scaling child GENERATE 16M docs on 2 cores —
    // measured past its own 20-minute kill deadline.
    val scalingDocsPre =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING_DOCS", "16000000").toLong
    Flagship.stageInput(spark, nDocs)
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING", "1") == "1")
      Flagship.stageInput(spark, scalingDocsPre)
    spark.stop()
    val flag = forkedLevel(cpus.toInt, nDocs)
      .getOrElse(inProcessLevel(cpus.toInt, nDocs))

    // the scaling pair needs enough work per run that fixed stage
    // overheads don't drown the 8-core side (at 2M docs the 8-core run
    // is ~3 s and efficiency reads artificially low; 16M is BASELINE.md's
    // measured protocol point)
    val scaling =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING", "1") == "1")
        Some(scalingBlock(scalingDocsPre))
      else None

    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsCold = results.map { case (k, _, c, _) => "\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum + flag.med
    val totalCold = results.map(_._3).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""queries_protocol":"warm_second_run","queries_cold":$qsCold,""" +
        s""""total_cold":$totalCold,""" +
        s""""failed":$failed,""" +
        s""""flagship":{"docs":$nDocs,"sec":${flag.med},"best_sec":${flag.best},""" +
        s""""docs_per_sec":${flag.dps},"pip_hits":${flag.pip},""" +
        s""""grid_cells":${flag.cells},"checksum":${flag.chk},""" +
        s""""protocol":"forked_warm_median_of_5"},""" +
        scaling.map(s => s + ",").getOrElse("") +
        s""""sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
  }
}
