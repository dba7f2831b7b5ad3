package graft

import org.apache.spark.sql.SparkSession

/** Single-query wall-time probe for local iteration: 2 reps per named
  * query at sf0.1 (cache-cleared between reps, same session settings as
  * Bench). The full composite lives in Bench; this exists to chase one
  * query's regression without paying for 87.
  *
  * Usage: runMain graft.TimeCheck q_image_neardup [q_more...]
  */
object TimeCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.datetime.java8API.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ZetaFunctions.register(spark)
    spark.range(0, 1000, 1, 4).selectExpr("sum(id)").collect()
    args.foreach { q =>
      (1 to 2).foreach { i =>
        GraftCaches.releaseAll(spark); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        println(f"TIMECHECK $q rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
