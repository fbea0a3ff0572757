package graft

/** Benchmark main: times every driver-contract query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line, and exits nonzero if any
  * query fails (a broken query must never silently inflate the total).
  *
  * Noise control: an untimed warmup query runs first (so the
  * alphabetically-first entry no longer absorbs JVM/parquet/codegen
  * first-touch cost), and each entry reports best-of-2 (entries build
  * fresh temp store dirs per invocation, so a re-run is independent;
  * the min discards transient machine-load spikes like the round-5
  * false x6 alarm).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.register(spark)

    def load1m: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Process CPU time (all threads of this JVM, ns). Wall-clock alone
    // cannot distinguish "the query did more work" from "the disk
    // stalled": the round-9 driver artifact read 12 write/spill-heavy
    // entries 1.9-4.6x hotter than a same-code, same-load builder run
    // because of cold page cache — invisible to load1m. An IO-stalled
    // entry burns little CPU while the wall clock runs, so a cpu/wall
    // ratio far below the suite median flags it.
    def processCpuNs: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }
    // Accumulated GC elapsed time (ms, all collectors). Process-CPU of a
    // 32-thread JVM includes GC and scheduler spin, which scale WITH
    // contention — the round-10 driver artifact inflated cpu roughly
    // proportionally with wall (x7: wall 0.11->0.67, cpu 0.13->0.84), so
    // the plain cpu/wall ratio stayed near the median and io_suspect came
    // back empty while 20+ entries ran hot. (cpu - gc) is the
    // stall-invariant signal: real extra work raises it, contention does
    // not. We multiply gc wall-time by the parallel-GC thread estimate to
    // approximate its CPU cost before subtracting.
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // Task-level bytes read (file input + shuffle read), via listener:
    // an IO-stalled entry shows wall growth with FLAT bytes_read, a
    // genuinely bigger scan shows both growing.
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    // Input ROWS delivered by scans (post row-group/page pruning) —
    // the pruning-proof metric: bytesRead on local-FS dictionary-
    // encoded parquet under-reports (the vectorized reader's buffered
    // stream accounting), so a pruned scan can look byte-cheap without
    // being row-cheap and vice versa; records_read moves exactly with
    // what the scan actually decoded.
    val recordsRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            bytesRead.addAndGet(
              m.inputMetrics.bytesRead + m.shuffleReadMetrics.totalBytesRead)
            recordsRead.addAndGet(m.inputMetrics.recordsRead)
          }
        }
      })
    // Sampled at start AND end: a run that STARTS loaded (a lingering
    // forked test JVM, a concurrent build) is already distorted before
    // the first timed entry, and an end-only sample hides it.
    val loadStart = load1m

    // Untimed warmup: touch every base table + run one agg and one kNN
    // so IO, codegen and broadcast paths are hot before timing starts.
    try {
      SparkEntry.queries.get("a4_agg_events").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("v1_knn_l2_one").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => () }

    var failures = List.empty[String]
    // Optional comma-separated entry filter (local iteration only —
    // the driver runs the full set).
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty)
    // Detector self-check (SPARK_GRAFT_BENCH_DIAG=1): a synthetic
    // pure-stall entry — wall runs, (cpu - gc) stays ~0 — that MUST
    // land in io_suspect. Validates the GC-adjusted ratio labels a
    // stalled entry correctly without waiting for a contended driver
    // run to happen naturally. Never part of a normal suite.
    val diag: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] =
      if (!sys.env.contains("SPARK_GRAFT_BENCH_DIAG")) Map.empty
      else Map("bench_diag_stall" -> { (s, _) =>
        import s.implicits._
        Thread.sleep(1500)
        Seq(Tuple1(1L)).toDF("one")
      })
    val unfiltered = SparkEntry.queries ++ SparkEntry.benchQueries ++ diag
    // A typo'd (or renamed-away) name in the fixed-window set would
    // silently re-enable min-of-N for a steady-state window — the
    // declared-set design trades the old prefix test's auto-coverage
    // for this loud registration check.
    require(SparkEntry.fixedWindowBench.subsetOf(unfiltered.keySet),
      "fixedWindowBench names not registered as bench entries: " +
        (SparkEntry.fixedWindowBench -- unfiltered.keySet).mkString(", "))
    val all = unfiltered
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
    // The listener bus is async: sample the byte/row counters only
    // once they stabilize (two identical reads 30ms apart, 500ms cap),
    // or a late onTaskEnd leaks one rep's rows into another entry's
    // delta — records_read is an adjudication metric, so committed
    // counts must be attributable. `listenerDrained` carries across
    // entries: a clean post-run drain makes the next pre-baseline
    // drain a no-op (no double 30ms sleep per rep); a FAILED rep
    // clears it so its late events are absorbed before the next
    // baseline sample.
    def drainListener(): Unit = {
      var prev = (bytesRead.get(), recordsRead.get())
      var waited = 0
      while (waited < 500) {
        Thread.sleep(30); waited += 30
        val cur = (bytesRead.get(), recordsRead.get())
        if (cur == prev) waited = 500 else prev = cur
      }
    }
    var listenerDrained = false
    val results = all.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Per rep: (wall, process-cpu, gc, bytes-read) — all seconds except
      // bytes. Report the min-wall rep's tuple so the stats correspond to
      // the wall we publish.
      // The listener bus is async: sample the byte/row counters only
      // once they stabilize (two identical reads 30ms apart, 500ms
      // cap), or a late onTaskEnd leaks one rep's rows into another
      // entry's delta — records_read is an adjudication metric, so
      // committed counts must be attributable.
      // Fixed-duration steady-state windows run ONE rep: their wall
      // IS the configured window, so min-of-N re-measures nothing,
      // doubles the suite cost, and leaves the published extras
      // (QPS/percentiles, overwritten per rep) from a DIFFERENT rep
      // than the published min wall. The set is declared next to the
      // entries (SparkEntry.fixedWindowBench), not inferred from a
      // name prefix.
      val entryReps = if (SparkEntry.fixedWindowBench.contains(name)) 1
        else reps
      val times = (1 to entryReps).flatMap { _ =>
        // Drain BEFORE sampling the baselines when the previous rep
        // did not close cleanly: a FAILED rep skips its post-run
        // drain, and its late async onTaskEnd events would otherwise
        // leak into this rep's b0/r0 — the exact cross-attribution
        // the drain exists to prevent.
        if (!listenerDrained) drainListener()
        listenerDrained = false
        val t0 = System.nanoTime(); val c0 = processCpuNs
        val g0 = gcMs; val b0 = bytesRead.get()
        val r0 = recordsRead.get()
        try {
          fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          val cpu = if (c0 >= 0) (processCpuNs - c0) / 1e9 else -1.0
          val gc = (gcMs - g0) / 1e3
          // Wall and cpu are sampled above, before this rep's own
          // closing drain.
          drainListener()
          listenerDrained = true
          val br = bytesRead.get() - b0
          val rr = recordsRead.get() - r0
          Some((wall, cpu, gc, br, rr))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      if (times.size < entryReps) failures ::= name
      name -> (if (times.nonEmpty) times.minBy(_._1)
               else (-1.0, -1.0, -1.0, -1L, -1L))
    }
    val total = results.collect { case (_, (w, _, _, _, _)) if w >= 0 => w }.sum
    // IO-stall self-diagnosis: entries whose GC-ADJUSTED cpu/wall ratio
    // sits far below the suite median were waiting (cold page cache, disk
    // contention), not computing. GC cpu cost is approximated as gc
    // wall-time x the parallel-collector thread count (~cpus/4 on G1,
    // floor 1) and subtracted, so contention-driven GC inflation no
    // longer masks the stall (the round-10 blind spot). Only entries long
    // enough to measure (>0.3 s wall) participate; the adjusted ratio
    // spans ~1-32 on this 32-thread JVM so "far below" = under 40% of
    // the median.
    val gcThreads = math.max(1, cpus.toInt / 4).toDouble
    // EVERY entry gets a stats object — a failed entry publishes its
    // -1 sentinels rather than vanishing, so the artifact's `entries`
    // count always equals entry_stats coverage (the lint invariant in
    // tools/check_oracle.py) and a failure is visible IN the artifact,
    // not only via the exit code. Ratio/io_suspect math filters the
    // sentinels below.
    val entryStats = results.map { case (k, (w, c, g, b, rr)) =>
      val adjCpu = math.max(c - g * gcThreads, 0.0)
      val ratio = if (w >= 0 && c >= 0) adjCpu / math.max(w, 1e-9) else -1.0
      (k, w, c, g, b, rr, ratio)
    }
    val ratios = entryStats.collect {
      case (_, w, _, _, _, _, r) if w > 0.3 && r >= 0 => r }.sorted
    val medianRatio =
      if (ratios.isEmpty) 0.0 else ratios(ratios.size / 2)
    val ioSuspects = entryStats.collect {
      case (k, w, _, _, _, _, r)
        if w > 0.3 && r >= 0 && medianRatio > 0 &&
          r < 0.4 * medianRatio => k
    }
    // Locale-pinned numeric formatting: the f-interpolator uses the
    // default locale, which renders "0,123" (invalid JSON) on
    // comma-decimal locales.
    def num(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f",
        Double.box(v))
    // ONE stats map per entry (round-13: the pre-fold artifact carried
    // the same 350+ keys twice — bare walls under `queries` plus full
    // stats under `entry_stats`; wall now lives only here, and
    // tools/check_oracle.py's bench lint gates the schema). Entries
    // that measure more than a wall (the QPS steady-state bench)
    // publish extra numeric stats via SparkEntry.benchExtras, merged
    // into their entry_stats object.
    // Concurrency-scaling ratio for the QPS family (round-14): the
    // 1-worker -> N-worker aggregate-QPS ratio is the signal that
    // stayed stable across contended same-code runs (3.7-6.6x in r13)
    // while absolute QPS swung 2x — published on the steady entry so
    // BASELINE.md's band adjudicates it round over round.
    for {
      st <- Option(SparkEntry.benchExtras.get("bench_qps_search_steady"))
      w1 <- Option(SparkEntry.benchExtras.get("bench_qps_search_w1"))
      q1 = w1.getOrElse("qps", 0.0) if q1 > 0
    } SparkEntry.benchExtras.put("bench_qps_search_steady",
      st + ("scaling_vs_w1" -> st.getOrElse("qps", 0.0) / q1))
    val statsJson = entryStats.map { case (k, w, c, g, b, rr, _) =>
      val baseExtras = Option(SparkEntry.benchExtras.get(k))
        .getOrElse(Map.empty[String, Double])
      // Contention-normalized companion for every QPS window:
      // searches per busy-cpu-second, busy = cpu minus the GC-thread
      // estimate — the same stall-invariant taxonomy as io_suspect.
      // Wall-clock QPS on a contended 32-core box swings 2x between
      // same-code runs; real extra work moves busy cpu, contention
      // does not, so THIS is the round-over-round adjudication stat.
      // (The entry's cpu includes its outside-the-window setup —
      // fixture access and the completeness-expectation count — a
      // small constant at a given SF, identical across same-code
      // runs, so it cancels in the round-over-round comparison.)
      // busy <= 0 means the gcThreads estimate swallowed the measured
      // cpu (a GC-bound degenerate window) — publish the -1 sentinel,
      // like the io_suspect path's ratio guard, instead of dividing by
      // the epsilon clamp and shipping a ~1e11 adjudication stat.
      val busy = c - g * gcThreads
      val extrasMap =
        if (baseExtras.contains("searches") && c >= 0)
          baseExtras + ("searches_per_busy_cpu_s" ->
            (if (busy > 0) baseExtras("searches") / busy else -1.0))
        else baseExtras
      val extras = extrasMap.toSeq.sortBy(_._1)
        .map { case (ek, ev) => ",\"" + ek + "\":" + num(ev, 3) }
        .mkString
      "\"" + k + "\":{\"wall\":" + num(w, 3) + ",\"cpu\":" + num(c, 3) +
        ",\"gc\":" + num(g, 3) + ",\"bytes_read\":" + b +
        ",\"records_read\":" + rr + extras + "}"
    }.mkString("{", ",", "}")
    val ioJson = ioSuspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The 1-min load averages make load-distorted runs self-evident in
    // the artifact (a quiet machine reads ~0-2 here; a concurrent build
    // session reads 10+ and inflates every wall-clock number — the r8
    // driver artifact shipped at load1m 10.59 and every entry read ~2x
    // hot). The explicit warning field self-labels such artifacts so a
    // reader never takes the numbers at face value.
    val loadEnd = load1m
    // Warn on the MINIMUM of the two samples: the bench's own 32-thread
    // work legitimately lifts the END sample to ~4-6 on a quiet
    // machine, so max() would cry wolf on every clean full run; a
    // CONTAMINATED run (r8: a concurrent build at load ~10) is loaded
    // at both ends.
    val warning =
      if (math.min(loadStart, loadEnd) > 5)
        s""","warning":"load1m ${num(loadStart, 2)}->${num(loadEnd, 2)} during run: timings are load-contaminated, re-measure on a quiet machine""""
      else ""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","entries":${results.size},"sf":"$sfDir","failed":${failures.size},"load1m":$loadEnd,"load1m_start":$loadStart,"cpu_wall_median":${num(medianRatio, 2)},"io_suspect":$ioJson,"entry_stats":$statsJson$warning}"""
    // Lossless copy for the driver: stdout tail-capture has truncated
    // the per-query head before (round 6); the file always has it all.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")),
      line.getBytes)
    // Stop Spark BEFORE the JSON lines go out: a wrapper capturing
    // stdout+stderr merged must see the compact line LAST, and
    // spark.stop() can emit late WARN lines.
    spark.stop()
    println(line)
    // Compact trailing line for the driver's stdout TAIL capture: the
    // full line above has outgrown the wrapper's 2000-char tail since
    // round 1 (every BENCH_r*.json reads `"parsed": null` with the
    // line's head cut off), so a wrapper scanning the tail for a
    // parseable `{"metric":...}` line has never found one. This line
    // stays well under the tail window: the `queries` map carries only
    // the slowest entries (the ones worth adjudicating from a tail),
    // io_suspect is capped, and `full` points at the committed
    // lossless artifact.
    val slowest = results.filter(_._2._1 >= 0)
      .sortBy(-_._2._1).take(10)
      .map { case (k, (w, _, _, _, _)) => "\"" + k + "\":" + num(w, 3) }
      .mkString("{", ",", "}")
    val ioCompact = ioSuspects.take(10).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$slowest,"queries_elided":${results.size - math.min(10, results.size)},"entries":${results.size},"sf":"$sfDir","failed":${failures.size},"load1m":${num(loadEnd, 2)},"load1m_start":${num(loadStart, 2)},"cpu_wall_median":${num(medianRatio, 2)},"io_suspect":$ioCompact,"full":"bench_last.json"$warning}""")
    if (failures.nonEmpty) sys.exit(1)
  }
}
