package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** Execute the full plan and consume every row via the noop sink.
    * `count()` would let the optimizer drop a final orderBy (aggregates
    * don't need order), leaving sort cost systematically unmeasured. */
  private def consume(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** This JVM's cumulative process CPU seconds (-1 if unavailable). */
  private def procCpuSec: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  /** 1-minute system load average (-1 if unavailable) — sampled at
    * bench start and end so box contention reads directly off the
    * artifact instead of being inferred from timing spreads. */
  private def loadAvg: Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: the first action pays one-time JVM/codegen/
    // scheduler setup (~3-4 s) that would otherwise be attributed to
    // whichever query happens to run first.
    try consume(SparkEntry.queries("q1_agg")(spark, sfDir))
    catch { case _: Throwable => }
    // Per-query median of `runs` in-process runs: single-run timings
    // on a contended box produced phantom 5-10x outliers round over
    // round; the median is stable to ~5% back-to-back. Repetitions are
    // INTERLEAVED round-robin (the full query list once per round, not
    // N consecutive runs per query): a multi-minute contention window
    // on the box then inflates at most one round of every query — the
    // median and min survive — instead of wholesale corrupting every
    // repetition of the adjacent block of queries (the r7/r9 artifact
    // failure mode). Every raw run is also emitted (`runs`), plus
    // bench wall vs process-CPU time, so a contended run (wall >> cpu
    // despite 32 local cores) is self-diagnosing from the artifact.
    val wall0 = System.nanoTime()
    val cpu0 = procCpuSec
    val load0 = loadAvg
    // Local iteration: SPARK_GRAFT_ONLY=q_a,q_b limits the run (same
    // contract as Verify); unset = the full inventory.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // A fixed NO-OP control, timed each round like any query: its
    // cost is the pure per-query constant (parse/analyze/optimize
    // through the full extension stack + a one-row noop write).
    // Round-over-round drift that shows up HERE is machine or
    // stack-constant overhead, not a plan regression (the r17 1.28×
    // common-subset question). q_metadata_count plays the same role
    // for the metadata-only path. Excluded from every total.
    val control = "control_select1" ->
      ((s: SparkSession, _: String) => s.sql("SELECT 1 AS one"))
    val timed = selected + control
    val order = selected.keys.toIndexedSeq :+ control._1
    val timings = scala.collection.mutable.Map.empty[String, Vector[Double]]
    def oneRound(): Unit = for (name <- order) {
      val fn = timed(name)
      val t0 = System.nanoTime()
      val sec =
        try { consume(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      timings(name) = timings.getOrElse(name, Vector.empty) :+ sec
    }
    // Contention self-defense: when the box was overtly contended
    // during the base rounds (median/min > 3 on more than 10% of
    // queries — the r18 signature, where interleaved round totals
    // spread 4.2x), run extra interleaved rounds (up to 5 total) so
    // the per-query min gets more clean shots. The spread fraction
    // and rounds-run land in the artifact for the reader.
    def spreadFrac(): Double = {
      val ratios = order.filterNot(_.startsWith("control_")).flatMap { n =>
        val ok = timings(n).filter(_ >= 0).sorted
        if (ok.isEmpty || ok.head <= 0) None
        else Some(ok(ok.length / 2) / ok.head)
      }
      if (ratios.isEmpty) 0.0 else ratios.count(_ > 3.0).toDouble / ratios.size
    }
    // Timeout-proofing (the r19 failure: the driver's wall-clock cap
    // killed the JVM before the single end-of-run emission, leaving
    // rc=124 and ZERO per-query data from a ~40-minute run):
    //   1. the COMPLETE artifact — runs-detail file (atomic tmp+move)
    //      and the canonical stdout lines — is re-emitted after EVERY
    //      finished round, so a kill at any point leaves the last
    //      completed round's full, parseable artifact, and the
    //      driver's last-JSON-line reader sees the freshest total;
    //   2. a wall budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default 1800)
    //      skips any further round — base or spread-extended — when
    //      the elapsed wall plus the previous round's duration would
    //      overrun it, recording how many rounds were skipped instead
    //      of silently overrunning the cap.
    val budgetSec = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_BUDGET_SEC", "1800").toDouble
    var rounds = 0
    var skipped = 0
    var lastRoundSec = 0.0

    // Locale-pinned: a comma decimal separator would corrupt the JSON.
    def f(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val runsFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_RUNS_FILE", "target/bench_runs.json"))

    def emit(): Unit = {
      val allRuns = order.map(n => n -> timings(n))
      val wallSec = (System.nanoTime() - wall0) / 1e9
      val cpuSec = if (cpu0 < 0) -1.0 else procCpuSec - cpu0
      val results = allRuns.map { case (name, times) =>
        val ok = times.filter(_ >= 0).sorted
        name -> (if (ok.isEmpty) -1.0 else ok(ok.length / 2))
      }.toMap
      // Per-query MIN alongside the median: on a machine with
      // transient contention the min is the best estimate of intrinsic
      // cost; a large median/min ratio flags the specific queries that
      // absorbed a contention window.
      val mins = allRuns.map { case (name, times) =>
        val ok = times.filter(_ >= 0)
        name -> (if (ok.isEmpty) -1.0 else ok.min)
      }.toMap
      val qs = order.map(k => s"\"" + k + "\":" + f(results(k)))
        .mkString("{", ",", "}")
      val qmins = order.map(k => s"\"" + k + "\":" + f(mins(k)))
        .mkString("{", ",", "}")
      val rs = allRuns.map { case (k, ts) =>
        s"\"" + k + "\":" + ts.map(f).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      // totals cover the REAL queries only — the control rides along
      // in the per-query dicts but must not shift totals
      def real(m: Map[String, Double]): Iterable[Double] =
        m.collect { case (k, v) if !k.startsWith("control_") => v }
      val total = if (results.nonEmpty) real(results).sum else 0.0
      val totalMin =
        if (mins.nonEmpty) real(mins).filter(_ >= 0).sum else 0.0
      val common = s""""rounds":$rounds,"rounds_so_far":$rounds,""" +
        s""""rounds_skipped_for_budget":$skipped,""" +
        s""""budget_sec":${f(budgetSec)},""" +
        s""""spread_frac":${f(spreadFrac())},""" +
        s""""load_avg_start":${f(load0)},"load_avg_end":${f(loadAvg)}"""
      // The full per-run detail goes to a FILE: log-tail truncation
      // was cutting long stdout JSON lines (round 7 lost the canonical
      // total itself once the per-query dict grew past the driver's
      // log-tail budget). Stdout ends with a SHORT canonical line that
      // can never be clipped: per-query mins ride on the penultimate
      // line, and the final {"metric":"total"} line carries only
      // total/cpus/sf — consumers that keep just the last ~2KB of the
      // log (or the last JSON-looking line) always see it whole.
      val detail =
        s"""{"metric":"runs_detail","runs":$rs,"mins":$qmins,"total_min":${f(totalMin)},"wall_sec":${f(wallSec)},"proc_cpu_sec":${f(cpuSec)},$common}"""
      // The tail per-query dict carries the MINS — the same estimator
      // as the canonical {"metric":"total"} min-sum, so a per-query
      // diff against the tail never mixes estimators (the r14 phantom
      // "q22 3x regression" was a median diffed against a min-sum).
      // Medians ride along under their own key for contention
      // diagnosis.
      val medians = s"""{"metric":"queries","queries":$qmins,"medians":$qs}"""
      try {
        Option(runsFile.getParent)
          .foreach(java.nio.file.Files.createDirectories(_))
        // atomic replace: a kill mid-write leaves the previous round's
        // complete file, never a torn one
        val tmp = runsFile.resolveSibling(runsFile.getFileName.toString + ".tmp")
        java.nio.file.Files.write(tmp,
          (detail + "\n" + medians + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        try java.nio.file.Files.move(tmp, runsFile,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
          java.nio.file.Files.move(tmp, runsFile,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      } catch { case e: java.io.IOException =>
        System.err.println(s"bench: could not write $runsFile: $e")
      }
      println(detail)
      println(medians)
      // The canonical value is the MIN-sum, not the median-sum: on a
      // box with a multi-minute contention window the per-query
      // minimum is the only estimator of intrinsic cost that survives
      // (round 13's median-sum read as a phantom +48% regression). The
      // median-sum rides along as total_median for drift comparison.
      println(s"""{"metric":"total","value":${f(totalMin)},"unit":"sec","total_median":${f(total)},"wall_sec":${f(wallSec)},"proc_cpu_sec":${f(cpuSec)},$common,"cpus":$cpus,"sf":"$sfDir"}""")
      System.out.flush()
    }

    def elapsedSec: Double = (System.nanoTime() - wall0) / 1e9
    // true = the round ran; false = skipped for budget. The first
    // round always runs (lastRoundSec 0): a budget too small for even
    // one round should still yield one round's artifact, not nothing.
    def budgetedRound(): Boolean =
      if (rounds > 0 && elapsedSec + lastRoundSec > budgetSec) {
        skipped += 1
        false
      } else {
        val t0 = System.nanoTime()
        oneRound()
        lastRoundSec = (System.nanoTime() - t0) / 1e9
        rounds += 1
        emit()
        true
      }
    while (rounds + skipped < runs) budgetedRound()
    while (rounds + skipped < math.max(runs, 5) && spreadFrac() > 0.10)
      budgetedRound()
    if (skipped > 0) {
      System.err.println(
        s"bench: skipped $skipped round(s) to stay under " +
          s"${budgetSec}s wall budget (elapsed ${f(elapsedSec)}s)")
      emit() // so the final artifact records the skip count
    }
    spark.stop()
  }
}
