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
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "/tmp/graft_bench_detail.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.datetime.java8API.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ZetaFunctions.register(spark)
    // JVM/session warm-up outside the timed region (codegen, block manager,
    // shuffle machinery) so the first query doesn't absorb startup cost.
    spark.range(0, 1000, 1, 4).selectExpr("sum(id)").collect()
    // One UNTIMED warm-up rep per query, then n timed reps; report the
    // median AND min of the SUCCESSFUL timed reps. The warm-up pays the
    // query's whole-stage-codegen compile + JIT outside the timed region
    // (the per-session warm-up above can't — codegen is per-plan): the r10
    // driver artifact reported 4.46 s for a query that steady-states at
    // 0.56 s because under box contention 2 of 3 cache-cleared reps paid
    // compile and the median lied. The data cache is still cleared between
    // timed reps, so every rep recomputes from parquet; median measures
    // the plan, min shows the uncontended floor.
    //
    // r12 — the long-lived-JVM second-order effect (VERDICT r11 "What's
    // wrong" #1; four memory-heavy queries reported 2-3x over fresh-JVM
    // steady state with min == median, i.e. EVERY rep inflated): the
    // session accumulates dead broadcast blobs + cached-codegen garbage
    // across 139x4 plans, and Spark only reclaims broadcasts when the
    // ContextCleaner's WEAK references get collected — which a big -Xmx8g
    // heap under G1 defers until a query with real memory pressure forces
    // a collection INSIDE its timed region, charging earlier queries'
    // garbage to whoever runs next. Countermeasures, all OUTSIDE the
    // timed region: (a) tracked-intermediate unpersist is BLOCKING so
    // eviction work can't bleed into the next rep; (b) one System.gc()
    // per query before its timed reps drains the reference queue and
    // lets the ContextCleaner reclaim broadcast/accumulator state at a
    // known point; (c) per-query GC time during timed reps is recorded
    // ("gc_sec" in the detail artifact) so residual inflation is
    // ATTRIBUTABLE to collector pressure vs the plan. Streaming queries
    // additionally run >= 5 reps (micro-batch floor dominates them; the
    // extra reps cost ~10 s total and tighten the round-over-round
    // signal — VERDICT r11 #8).
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis(): Long = {
      var s = 0L; gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime)); s
    }
    def stabilize(): Unit = {
      GraftCaches.releaseAll(spark, blocking = true)
      spark.catalog.clearCache()
      System.gc()
    }
    // Optional subset filter (map order preserved): bisecting which
    // predecessor query poisons a later one's environment needs bench-
    // context runs of arbitrary prefixes, which TimeCheck can't reproduce.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val raw = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      stabilize()
      try fn(spark, sfDir).count() catch { case _: Throwable => () } // warm-up
      stabilize()
      val gc0 = gcMillis()
      val qReps = if (name.contains("stream")) math.max(reps, 5) else reps
      val runs = (1 to qReps).map { _ =>
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
      (name, runs, (gcMillis() - gc0) / 1e3)
    }
    val (ok, bad) = raw.partition { case (_, runs, _) => runs.exists(_._2.isEmpty) }
    val results = ok.map { case (name, runs, _) =>
      val s = runs.collect { case (t, None) => t }.sorted
      name -> s(s.length / 2)
    }.sortBy(_._1)
    val mins = ok.map { case (name, runs, _) =>
      name -> runs.collect { case (t, None) => t }.min
    }.toMap
    // Per-query map with "q_" prefixes stripped and 2-decimal values keeps
    // the detailed line under the driver's ~2,000-char stdout tail capture.
    val qs = results.map { case (k, v) => "\"" + k.stripPrefix("q_") + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val errNames = bad.map(_._1).sorted
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
      s""""n_queries":${results.size},"errors":${errNames.size},""" +
      s""""error_queries":[${errNames.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""reps":$reps,"sf":"$sfDir"}"""
    // Full per-rep detail + error messages + per-query GC attribution
    // (seconds of collector time during the timed reps), execution order,
    // to a side file.
    val repsDetail = raw.map { case (k, runs, _) =>
      "\"" + k + "\":[" + runs.map {
        case (t, None)    => f"$t%.3f"
        case (t, Some(m)) => "{\"t\":" + f"$t%.3f" + ",\"err\":\"" +
          m.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\"}"
      }.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val gcDetail = raw.map { case (k, _, gcSec) => "\"" + k + "\":" + f"$gcSec%.3f" }
      .mkString("{", ",", "}")
    try Files.write(Paths.get(detailPath),
      (line.dropRight(1) + s""","reps_detail":$repsDetail,"gc_sec":$gcDetail}""" + "\n")
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
      .map { case (k, v) => "\"" + k.stripPrefix("q_") + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""n_queries":${results.size},"errors":${errNames.size},"reps":$reps,""" +
      s""""slowest":$top,"sf":"$sfDir"}""")
    spark.stop()
  }
}
