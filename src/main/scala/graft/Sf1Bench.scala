package graft

import org.apache.spark.sql.SparkSession

/** The sf1 evidence point (VERDICT r11 next-round #1): run the headline
  * SparkEntry queries at sf0.1 and at the MATERIALIZED sf1 dir (Sf1Gen)
  * and report per-query median/min at both scales plus the 10x ratio.
  * BASELINE's criterion is "within 2x at the same scale factor" and every
  * full-suite number so far is sf0.1 — this main produces the measured
  * sf0.1 -> sf1 scaling that SCALE_r10's synthetic in-plan 10x curves
  * could only approximate (real parquet scan, real file parallelism,
  * real row-group pruning at 10x bytes).
  *
  * Measurement discipline matches Bench: per-query untimed warm-up rep
  * (pays whole-stage-codegen compile + JIT), blocking cache release +
  * System.gc() outside the timed region, median AND min of the timed
  * reps, cache cleared between reps so every rep recomputes from parquet.
  *
  * Usage: runMain graft.Sf1Bench [smallDir] [largeDir] [queryCsv] [reps]
  * Prints one JSON line per query and a final summary line.
  */
object Sf1Bench {
  /** Headline subset from the r11 verdict: q1_agg, sql join, dedup
    * family, ann family, decontaminate, streaming joins — plus the r12
    * additions (bm25, zorder3) and inverted_index (its r11 scale fix
    * deserves a measured curve).
    */
  val headline: Seq[String] = Seq(
    "q1_agg", "q_sql_join",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram",
    "q_dedup_clusters", "q_dedup_incr_store",
    "q_ann_bruteforce", "q_ann_lsh", "q_ann_ivf", "q_ann_pq", "q_ann_ivfpq",
    "q_ann_int8",
    "q_decontaminate", "q_decontaminate_bloom",
    "q_inverted_index", "q_inverted_index_rel", "q_bm25", "q_zorder3",
    "q_stream_static_join", "q_stream_asof", "q_stream_interval_join")

  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val large = args.lift(1).getOrElse("/tmp/graft-sf1")
    val qs = args.lift(2).map(_.split(",").toSeq).getOrElse(headline)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    spark.range(0, 1000, 1, 4).selectExpr("sum(id)").collect()

    def stabilize(): Unit = {
      GraftCaches.releaseAll(spark, blocking = true)
      spark.catalog.clearCache()
      System.gc()
    }
    // (median, min, rows) of the successful timed reps; None if all err
    def measure(name: String, dir: String): Option[(Double, Double, Long)] = {
      val fn = SparkEntry.queries(name)
      stabilize()
      try fn(spark, dir).count() catch { case _: Throwable => () } // warm-up
      stabilize()
      val runs = (1 to reps).flatMap { _ =>
        GraftCaches.releaseAll(spark, blocking = true)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          val n = fn(spark, dir).count()
          Some(((System.nanoTime() - t0) / 1e9, n))
        } catch { case e: Throwable =>
          System.err.println(s"[sf1bench] $name@$dir: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(200))
          None
        }
      }
      if (runs.isEmpty) None
      else {
        val ts = runs.map(_._1).sorted
        Some((ts(ts.length / 2), ts.head, runs.head._2))
      }
    }

    val rows = qs.flatMap { name =>
      if (!SparkEntry.queries.contains(name)) {
        System.err.println(s"[sf1bench] unknown query $name"); None
      } else {
        val s = measure(name, small)
        val l = measure(name, large)
        val ratio = for ((sm, smin, _) <- s; (lm, lmin, _) <- l)
          yield (lm / sm, lmin / smin)
        val line = (s, l) match {
          case (Some((sm, smin, sn)), Some((lm, lmin, ln))) =>
            val (rm, rmin) = ratio.get
            f"""{"query":"$name","sf0.1":{"median":$sm%.3f,"min":$smin%.3f,"rows":$sn},""" +
            f""""sf1":{"median":$lm%.3f,"min":$lmin%.3f,"rows":$ln},""" +
            f""""ratio_median":$rm%.2f,"ratio_min":$rmin%.2f}"""
          case _ =>
            s"""{"query":"$name","err":"small=${s.isDefined} large=${l.isDefined}"}"""
        }
        println(line)
        Some((name, s, l))
      }
    }
    val ok = rows.collect { case (n, Some(s), Some(l)) => (n, s, l) }
    val totS = ok.map(_._2._1).sum
    val totL = ok.map(_._3._1).sum
    // totS==0 (every query failed at one scale) would print "NaN", which is
    // not valid JSON for downstream parsers — emit null for the ratio then
    val ratioJson = if (ok.nonEmpty && totS > 0) f"${totL / totS}%.2f" else "null"
    println(
      f"""{"metric":"sf1_total","queries":${ok.size},"sf0.1_sec":$totS%.2f,""" +
      f""""sf1_sec":$totL%.2f,"ratio":$ratioJson,""" +
      s""""small":"$small","large":"$large","reps":$reps}""")
    spark.stop()
  }
}
