package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

/** Measured evidence for writeBucketed's sizing rule (VERDICT r12 #3):
  * times the colocated fact-to-fact join at a given sfDir and bucket
  * count, so SCALE_r13 can show the 8-bucket sf1 degradation collapsing
  * once buckets scale with volume. Build time excluded (tables written
  * before the timed reps, exactly like the driver query's fixture).
  *
  * Usage: runMain graft.BucketPoint <sfDir> <buckets> [reps]
  * Prints one JSON line: {"metric":"bucket_point",...}
  */
object BucketPoint {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val buckets = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.datetime.java8API.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the point measures the CO-LOCATED SORT-MERGE path — the 100 TB
      // fact-to-fact shape where neither side broadcasts; at toy scale
      // Catalyst would otherwise broadcast the orders side and the bucket
      // count would never be exercised
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tok = dir.replaceAll("\\W", "_")
    val (tLi, tOrd) = (s"bktpt_li_${tok}_b$buckets", s"bktpt_ord_${tok}_b$buckets")
    val base = s"/tmp/graft_fixtures/bktpt_${tok}_b$buckets"
    ScaleOps.writeBucketed(
      Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
      tLi, buckets, Seq("l_orderkey"), Some(s"$base/lineitem"))
    ScaleOps.writeBucketed(
      Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus")),
      tOrd, buckets, Seq("l_orderkey"), Some(s"$base/orders"))

    def run(): Long =
      ScaleOps.colocatedJoin(spark, tLi, tOrd, Seq("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .count()

    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      ScaleOps.colocatedJoin(spark, tLi, tOrd, Seq("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .explain("formatted")

    run() // warm-up: codegen + JIT outside the timed region
    val ts = (1 to reps).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"""{"metric":"bucket_point","dir":"$dir","buckets":$buckets,""" +
      f""""median_sec":${ts(ts.length / 2)}%.3f,"min_sec":${ts.head}%.3f,"reps":$reps}""")
    spark.stop()
  }
}
