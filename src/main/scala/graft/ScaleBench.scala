package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dedup-family scale curve: times each dedup variant at sf0.01, sf0.1,
  * and a ~10x-sf0.1 corpus synthesized by replicating sf0.1 documents with
  * salted ids/text (no sf1 parquet exists in the test environment; the
  * replication happens inside the plan, so the timing still exercises the
  * real shuffle shapes at 10x volume). Prints one JSON line per scale.
  *
  * Usage: runMain graft.ScaleBench [testdataRoot]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/root/testdata")
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
    spark.range(0, 1000, 1, 4).selectExpr("sum(id)").collect()

    def docsAt(sf: String): DataFrame = Tables.load(spark, s"$root/$sf", "documents")

    def replicate(df: DataFrame, k: Int): DataFrame =
      (0 until k).map { i =>
        df.select((col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
          concat(col("text"), lit(s" replica_salt_$i")).as("text"))
      }.reduce(_.unionAll(_))

    val scales: Seq[(String, DataFrame)] = Seq(
      "sf0.01" -> docsAt("sf0.01"),
      "sf0.1" -> docsAt("sf0.1"),
      "sf0.1x10" -> replicate(docsAt("sf0.1"), 10))

    scales.foreach { case (name, docs0 ) =>
      val docs = docs0
      val nDocs = docs.count()
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      def released[T](f: => T): T =
        try f finally GraftCaches.releaseAll(spark)
      val (tExact, nExact) = time(released(Dedup.exact(docs, "doc_id", "text").count()))
      val (tMin, nMin) = time(released(Dedup.minHashPairs(docs, "doc_id", "text").count()))
      val (tSim, nSim) = time(released(Dedup.simHashPairs(docs, "doc_id", "text").count()))
      val (tNg, nNg) = time(released(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count()))
      val (tSub, nSub) = time(released(
        Dedup.substringDedup(docs, "doc_id", "text", minLen = 30, k = 10)
          .where(col("n_removed_tokens") > 0).count()))
      println(
        s"""{"scale":"$name","docs":$nDocs,""" +
        s""""exact":{"sec":$tExact,"rows":$nExact},""" +
        s""""minhash":{"sec":$tMin,"pairs":$nMin},""" +
        s""""simhash":{"sec":$tSim,"pairs":$nSim},""" +
        s""""ngram":{"sec":$tNg,"pairs":$nNg},""" +
        s""""substring":{"sec":$tSub,"docs_cut":$nSub}}""")
    }
    spark.stop()
  }
}
