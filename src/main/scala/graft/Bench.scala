package graft

import graft.api.Flagship
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR plus the flagship throughput pipeline and a
  * two-parallelism scaling protocol, prints ONE JSON line AND writes the
  * same line to SPARK_GRAFT_BENCH_OUT (default /root/repo/BENCH_LAST.json)
  * so downstream tooling never has to fish the line out of sbt noise.
  * Per-query failures are recorded in a "failed" list (and on stderr)
  * instead of being silently folded into the timings.
  *
  * TIMEOUT-PROOF BY CONSTRUCTION (round-3 lesson): the round-3 driver run
  * was killed (rc=124) under a ~3x noisy-neighbor load before a single
  * JSON byte was printed, so the round shipped no performance numbers at
  * all. This main now (a) tracks its own wall-clock budget
  * (SPARK_GRAFT_BENCH_BUDGET_MIN, default 25) and degrades each stage to
  * fit the time that is actually left, (b) runs the stages in GRADED
  * order — scaling (the north-rule efficiency) first, flagship
  * throughput second, the 98-query sweep last — and (c) emits a
  * complete, valid JSON line after EVERY stage, both to stdout and to
  * SPARK_GRAFT_BENCH_OUT, so an external kill at any point still leaves
  * the most important measurements on record. The last line printed is
  * always the most complete one. */
object Bench {

  private val benchT0 = System.nanoTime()
  private def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
  private val budgetSec: Double =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_MIN", "25").toDouble * 60.0
  private def remainSec: Double = budgetSec - elapsedSec

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

  /** One measured level of the warm protocol: median/best of the timed
    * runs after warm-ups, plus the result invariants. */
  private final case class LevelStats(
      dps: Long, med: Double, best: Double, chk: Long, pip: Long, cells: Long)

  /** One scaling level in a fresh fixed-heap child JVM (the BASELINE.md
    * apparatus). `deadlineSec` is a hard kill: a fork that overruns it is
    * destroyed and the level reported as absent — NOT silently re-run
    * in-process (round 3's 45-min fallback chain is what blew the
    * driver's overall timeout). */
  private def forkedLevel(cpus: Int, nDocs: Long, warmups: Int, runs: Int,
      deadlineSec: Long): Option[LevelStats] =
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
      pb.environment().put("SPARK_GRAFT_BENCH_WARMUPS", warmups.toString)
      pb.environment().put("SPARK_GRAFT_BENCH_RUNS", runs.toString)
      // Spark logs flood stderr: discard it or the pipe buffer fills
      // and the child deadlocks before printing its stdout JSON line
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val proc = pb.start()
      // read stdout on a reaper thread with a hard deadline: a hung
      // child must not wedge the whole bench
      val out = new java.util.concurrent.atomic.AtomicReference(Vector.empty[String])
      val reader = new Thread(() =>
        out.set(scala.io.Source.fromInputStream(proc.getInputStream)
          .getLines().toVector))
      reader.setDaemon(true)
      reader.start()
      if (!proc.waitFor(deadlineSec, java.util.concurrent.TimeUnit.SECONDS)) {
        proc.destroyForcibly()
        System.err.println(s"BENCH: forked level local[$cpus] exceeded " +
          s"$deadlineSec s, killed — level reported absent")
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

  /** In-process fallback (fresh session in THIS JVM) — only used for the
    * flagship block when there is no time left to fork, never for the
    * scaling pair (mixing JVM protocols across the pair once produced a
    * >1 "efficiency"). */
  private def inProcessLevel(cpus: Int, nDocs: Long, warmups: Int,
      runs: Int): LevelStats = {
    val s = session(cpus.toString)
    try {
      (1 to warmups).foreach(_ => Flagship.run(s, nDocs))
      val timed = (1 to runs).map { _ => System.gc(); Flagship.run(s, nDocs) }
      // true median: average the two middle elements on even run counts
      // (upper-middle alone would report the WORSE of 2 runs as "median")
      val sortedSec = timed.map(_.seconds).sorted
      val med =
        if (sortedSec.size % 2 == 1) sortedSec(sortedSec.size / 2)
        else (sortedSec(sortedSec.size / 2 - 1) + sortedSec(sortedSec.size / 2)) / 2.0
      val chk = timed.map(_.gridChecksum).distinct
      require(chk.size == 1, s"non-deterministic checksum at local[$cpus]")
      LevelStats((nDocs / med).toLong, med, timed.map(_.seconds).min, chk.head,
        timed.head.pipHits, timed.head.gridCells)
    } finally s.stop()
  }

  /** BASELINE.md scaling protocol on the north rule's N-vs-4N pair,
    * INTERLEAVED (round-5 protocol): one fixed-heap child JVM runs
    * [[InterleavedScalingBench]], alternating the two levels run by run
    * (2,8,2,8,…) so the box's slow per-core mood drift — which round 4
    * measured corrupting a sequential pair's ratio by landing entirely
    * on one level's median — hits both levels' medians equally and
    * cancels. The child also reports the median of per-ROUND pair
    * ratios (each pair seconds apart; the hardest drift cancellation)
    * and the best-of efficiency. A fork that dies or overruns its
    * deadline is reported absent — a partial artifact beats a killed
    * bench. */
  private def scalingBlock(nDocs: Long, warmups: Int, runs: Int): String = {
    // one fork runs the whole pair: deadline sized from measured wall
    // times at 16M docs (n2 48-95 s + n8 8-22 s per round, 6 rounds
    // incl. warm pair, ~40 s startup => 380-750 s), capped as a budget
    // fraction so a degraded box cannot starve the later stages
    val deadline = math.max(450L,
      math.min((remainSec * 0.80).toLong, (budgetSec * 0.60).toLong))
    val line = forkedInterleaved(nDocs, warmups, runs, deadline)
    val block = line.map { l =>
      def num(k: String): Option[String] =
        (s""""$k":(-?[0-9.eE+-]+)""").r.findFirstMatchIn(l).map(_.group(1))
      def str(k: String): Option[String] =
        (s""""$k":"([^"]*)"""").r.findFirstMatchIn(l).map(_.group(1))
      def arr(k: String): Option[String] =
        (s""""$k":(\\[[0-9.,eE+-]*\\])""").r.findFirstMatchIn(l).map(_.group(1))
      val parts = Seq(
        str("ballast").map(b => s""""ballast":"$b""""),
        num("ballast_to").map(b => s""""ballast_to":$b"""),
        for (m <- num("lo_median_sec"); b <- num("lo_best_sec");
             d <- num("lo_docs_per_sec"))
          yield s""""n2":{"sec":$m,"best_sec":$b,"docs_per_sec":$d,"mode":"interleaved"}""",
        for (m <- num("hi_median_sec"); b <- num("hi_best_sec");
             d <- num("hi_docs_per_sec"))
          yield s""""n8":{"sec":$m,"best_sec":$b,"docs_per_sec":$d,"mode":"interleaved"}""",
        // HEADLINE = median of per-ROUND pair ratios: each ratio is a
        // lo-then-hi pair run seconds apart, so slow per-core host drift
        // cancels inside every pair — it is the estimator the interleaved
        // protocol exists to produce. The unpaired ratio-of-medians
        // (levels pooled across the whole ~10 min window, drift exposed)
        // is kept as a labeled secondary.
        num("efficiency_pairs").map(e => s""""efficiency_2_8":$e"""),
        Some(s""""efficiency_2_8_protocol":"median_of_pair_ratios""""),
        num("efficiency").map(e => s""""efficiency_2_8_unpaired":$e"""),
        num("efficiency_best").map(e => s""""efficiency_2_8_best":$e"""),
        // raw per-run arrays so the spread behind every summary figure
        // is auditable from the artifact alone
        arr("lo_runs_sec").map(a => s""""lo_runs_sec":$a"""),
        arr("hi_runs_sec").map(a => s""""hi_runs_sec":$a"""),
        // the child REQUIREs checksum equality across every run of both
        // levels before printing its line
        Some(s""""checksums_match":true"""),
        num("checksum").map(c => s""""checksum":$c""")).flatten
      (parts, num("efficiency_pairs").isDefined)
    }
    val (levelParts, complete) = block.getOrElse((Seq.empty[String], false))
    val parts = levelParts ++
      Seq(s""""docs":$nDocs,"warm_pairs":$warmups,"timed_pairs":$runs,""" +
        s""""protocol":"interleaved_pairs","complete":$complete""")
    s""""scaling":{${parts.mkString(",")}}"""
  }

  /** Fork one [[InterleavedScalingBench]] child (both levels in one JVM,
    * alternating) and return its JSON line. Same fork hygiene as
    * [[forkedLevel]]: fixed heap, stderr discarded, hard deadline. */
  private def forkedInterleaved(nDocs: Long, warmPairs: Int, pairs: Int,
      deadlineSec: Long): Option[String] =
    try {
      val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
        "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar")
        .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
      val mem = sys.env.getOrElse("SPARK_GRAFT_FORK_MEM", "32g")
      val cmd = (Seq("java") ++ opens ++ Seq(s"-Xmx$mem", s"-Xms$mem",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", System.getProperty("java.class.path"),
        "graft.InterleavedScalingBench"))
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_DOCS", nDocs.toString)
      pb.environment().put("SPARK_GRAFT_BENCH_WARMUPS", warmPairs.toString)
      pb.environment().put("SPARK_GRAFT_BENCH_RUNS", pairs.toString)
      sys.env.get("SPARK_GRAFT_SCALE_MODE").foreach(m =>
        pb.environment().put("SPARK_GRAFT_SCALE_MODE", m))
      sys.env.get("SPARK_GRAFT_SCALE_BALLAST").foreach(m =>
        pb.environment().put("SPARK_GRAFT_SCALE_BALLAST", m))
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val proc = pb.start()
      val out = new java.util.concurrent.atomic.AtomicReference(Vector.empty[String])
      val reader = new Thread(() =>
        out.set(scala.io.Source.fromInputStream(proc.getInputStream)
          .getLines().toVector))
      reader.setDaemon(true)
      reader.start()
      if (!proc.waitFor(deadlineSec, java.util.concurrent.TimeUnit.SECONDS)) {
        proc.destroyForcibly()
        System.err.println(s"BENCH: interleaved scaling fork exceeded " +
          s"$deadlineSec s, killed — scaling reported absent")
        return None
      }
      reader.join(10000)
      out.get().find(_.startsWith("{\"mode\":\"interleaved"))
    } catch { case _: Throwable => None }

  /** Queries per SparkSession during the sweep. One session across the
    * whole (now 90+) query list accumulates state the queries themselves
    * release only via GC — localCheckpoint blocks, cached plans,
    * broadcast cleanup backlog — and late-alphabet queries were measured
    * up to 5x slower than the same query alone (round-3 sweep:
    * q_webpages_dedup 1.7 s standalone vs 9.4 s at position 78).
    * Recycling bounds the debt so position in the sweep stops being a
    * confounder; each query still pays its own full cold plan+codegen. */
  private final val RecycleEvery = 16

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SF-scope the oracle side tables (graft.queries.SideTables): the
    // sweep re-executes every query closure, and at a different SF than
    // the last Verify dump it would otherwise overwrite side tables a
    // pending DuckDB replay still reads.
    graft.queries.SideTables.setTokenFromSfDir(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LAST.json")

    def emit(json: String): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes("UTF-8"))
      println(json)
      System.out.flush()
    }

    var spark = session(cpus)

    // session warm-up so the first measured query doesn't pay JIT/codegen
    def warm(): Unit = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    warm()

    // optional comma-separated query filter (profiling aid; the driver
    // never sets it, so the contract output is unchanged)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").filter(_.nonEmpty).toSet)
    val toRun = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results =
      scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double, Boolean, Boolean)]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val stallRetried = scala.collection.mutable.ArrayBuffer.empty[String]

    def jsonWith(flagship: Option[String], scaling: Option[String],
        stages: Seq[String], flagSec: Double = 0.0): String = {
      val qs = results.collect { case (k, v, _, true, _) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val qsCold = results.map { case (k, _, c, _, _) => "\"" + k + "\":" + c }
        .mkString("{", ",", "}")
      val failed = results.collect { case (k, _, _, false, _) => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val onceList = results.collect { case (k, _, _, true, false) => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val skippedList = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val totalWarm = results.collect { case (_, v, _, true, _) => v }.sum
      val totalCold = results.map(_._3).sum
      s"""{"metric":"total","value":${totalWarm + flagSec},"unit":"sec","queries":$qs,""" +
        s""""queries_protocol":"warm_second_run","queries_cold":$qsCold,""" +
        s""""total_cold":$totalCold,"queries_once":$onceList,""" +
        s""""queries_skipped":$skippedList,""" +
        s""""stall_retried":${stallRetried.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""failed":$failed,""" +
        flagship.map(f => f + ",").getOrElse("") +
        scaling.map(s => s + ",").getOrElse("") +
        s""""stages_done":[${stages.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""queries_done":${results.size},"queries_total":${toRun.size},""" +
        s""""elapsed_sec":${"%.1f".format(elapsedSec)},"budget_sec":$budgetSec,""" +
        s""""sf":"$sfDir"}"""
    }

    // STAGE ORDER (round-4 revision): scaling -> flagship -> sweep. The
    // scaling efficiency is the north rule's graded number and the
    // flagship docs/sec the headline throughput; the 98-query sweep is
    // the longest and most degradable stage. Running the sweep first (as
    // round 3 did) meant an external kill or a degraded box shipped an
    // artifact with per-query times but NO scaling block — the one
    // number the baseline grades. Inputs for both forks are staged by
    // THIS full-parallelism session first (stageInput reuses an existing
    // _SUCCESS path, so the forked children only read; without this a
    // wiped /tmp makes the local[2] child GENERATE the docs on 2 cores —
    // measured past its own kill deadline).
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong
    // the scaling pair needs enough work per run that fixed per-run
    // overheads (scan setup, stage scheduling, ~1 s) don't drown the
    // 8-core side: at 8M docs the local[8] run is ~7 s, so that second
    // of overhead shaves ~15% off the efficiency ratio (measured 0.79 at
    // 8M vs 0.91 at 16M on the same commit — BASELINE.md round-2/round-4
    // tables); 16M is the protocol point BASELINE.md's curated numbers
    // use. The round-3 timeout risk that motivated 8M is now handled by
    // the hard per-level deadlines instead of a smaller input.
    val scalingDocs =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING_DOCS", "16000000").toLong
    val scalingOn =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING", "1") == "1" &&
        remainSec > 240
    Flagship.stageInput(spark, nDocs)
    if (scalingOn) Flagship.stageInput(spark, scalingDocs)
    spark.stop() // the forks get the whole machine

    // STAGE 1: scaling (the graded number)
    val scaling =
      // Median-of-5 is the BASELINE.md protocol core: the box shows
      // sporadic ~30 s stall runs (host-level steal) at BOTH levels — a
      // median of 3 can land ON the stall (measured: n8 22.0 s vs 8.1 s
      // median-of-3 fifteen minutes apart, same commit, idle box); 5
      // timed runs absorb one stall per level. 2 warm-ups (vs the
      // curated table's 3) buys the 16M input back into the n2 deadline;
      // the staging pass has already warmed the page cache, and the
      // median absorbs any residual first-run JIT.
      if (scalingOn) Some(scalingBlock(scalingDocs, warmups = 2, runs = 5))
      else Some(s""""scaling":{"complete":false,"skipped":"${
        if (remainSec <= 240) "budget_exhausted" else "disabled_by_env"}"}""")
    emit(jsonWith(None, scaling, Seq("scaling")))

    // STAGE 2: flagship throughput in a FRESH fixed-heap child JVM with
    // the warm protocol (measured inside the sweep JVM the reading is
    // dominated by the sweep's accumulated GC/codegen debt — round 3
    // measured a 9x distortion)
    // median-of-5: the box's sporadic ~30 s stall runs sit adjacent to a
    // 3-run median (one stall = the median IS the 2nd-best run); at 2M
    // docs the two extra runs cost ~8 s and buy the same stall
    // absorption the scaling levels get
    val flag =
      if (remainSec > 150)
        forkedLevel(cpus.toInt, nDocs, warmups = 2, runs = 5,
          deadlineSec = math.max(120L, (remainSec * 0.25).toLong))
          .map((_, "forked_warm_median_of_5"))
          .getOrElse((inProcessLevel(cpus.toInt, nDocs, 1, 2), "inprocess_median_of_2"))
      else (inProcessLevel(cpus.toInt, nDocs, 1, 2), "inprocess_median_of_2")
    val flagJson =
      s""""flagship":{"docs":$nDocs,"sec":${flag._1.med},"best_sec":${flag._1.best},""" +
        s""""docs_per_sec":${flag._1.dps},"pip_hits":${flag._1.pip},""" +
        s""""grid_cells":${flag._1.cells},"checksum":${flag._1.chk},""" +
        s""""protocol":"${flag._2}"}"""
    emit(jsonWith(Some(flagJson), scaling, Seq("scaling", "flagship"),
      flag._1.med))

    // STAGE 3: the per-query sweep. Each query is run twice in the same
    // session and BOTH times are reported: the first (cold) run pays
    // plan + whole-stage-codegen + JIT for every generated class the
    // query touches, which for the deep pipelines measured up to 10x
    // steady-state AND varies with the query's position relative to the
    // session recycle boundary. The warm (second) run is the per-query
    // figure of merit — it is what a long-lived executor JVM on a real
    // cluster runs — while the cold run keeps compile cost visible.
    // Degradation under budget pressure: past 80% of budget remaining
    // queries run ONCE (named in "queries_once"); past 98% they are not
    // run at all (named in "queries_skipped") — a skipped query beats a
    // 30 s cold run that eats the final emit.
    spark = session(cpus)
    warm()
    toRun.zipWithIndex.foreach { case ((name, fn), i) =>
      if (i > 0 && i % RecycleEvery == 0) {
        // PARTIAL CHECKPOINT: a kill mid-sweep must still leave every
        // completed query's timing on record (round 3 shipped nothing
        // because the first JSON byte was scheduled after the sweep)
        emit(jsonWith(Some(flagJson), scaling, Seq("scaling", "flagship",
          "sweep_partial"), flag._1.med))
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
      if (elapsedSec > budgetSec * 0.98) {
        skipped += name
      } else {
        val (cold, okCold) = once()
        val warmRun =
          if (okCold && elapsedSec < budgetSec * 0.8) Some(once()) else None
        // Host-stall detector: the box sporadically freezes one task
        // window for ~30-90 s (host-level steal; measured hitting 1-3
        // ADJACENT sweep queries per run — q_pq_* once, q_dup_clusters/
        // q_edge_filter another, healthy standalone both times). A warm
        // run that reads slower than its own cold run by 2x+ is such a
        // stall, not the query: retry once and take the faster warm
        // reading. Retried queries are named in "stall_retried" so the
        // figure is auditable.
        val retried = warmRun match {
          case Some((w, true)) if okCold && w > math.max(2 * cold, cold + 5.0) &&
              elapsedSec < budgetSec * 0.9 =>
            stallRetried += name
            val (w2, ok2) = once()
            Some((math.min(w, if (ok2) w2 else w), true))
          case other => other
        }
        // (name, figure-of-merit sec, cold sec, ok, figure-is-warm)
        results += (retried match {
          case Some((w, okW)) => (name, w, cold, okCold && okW, true)
          case None           => (name, cold, cold, okCold, false)
        })
      }
    }
    spark.stop()

    // FINAL: the complete artifact
    emit(jsonWith(Some(flagJson), scaling,
      Seq("scaling", "flagship", "sweep"), flag._1.med))
  }
}
