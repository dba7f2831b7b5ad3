package graft

import org.apache.spark.sql.functions._

/** Sf1Gen materializes a k-times replica of a testdata dir with
  * key-CONSISTENT offsets (TPC-H sf semantics): joins must keep their
  * per-key fan-out so a 10x corpus runs the same plan shapes 10x wider,
  * not 10x deeper. Verified at k=2 over sf0.001.
  */
class Sf1GenSpec extends SparkSpec {

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sf1gen").toString
    Sf1Gen.generate(spark, "/root/testdata/sf0.001", dir, k = 2)
    dir
  }
  private def t(name: String) = spark.read.parquet(s"$out/$name.parquet")
  private def src(name: String) =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")

  test("scaling tables grow k-fold; dims stay fixed") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(t(n).count() == 2 * src(n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(n).count() == src(n).count(), n)
  }

  test("key consistency: join fan-out is preserved, cardinality k-fold") {
    // every lineitem still finds exactly one order; every order one customer
    val li = t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(li == 2 * src("lineitem").count())
    val oc = t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey")).count()
    assert(oc == 2 * src("orders").count())
    // per-order line counts match the source distribution (fan-out constant)
    val fanSrc = src("lineitem").groupBy("l_orderkey").count()
      .groupBy("count").count().orderBy("count").collect().map(r => (r.getLong(0), r.getLong(1)))
    val fanOut = t("lineitem").groupBy("l_orderkey").count()
      .groupBy("count").count().orderBy("count").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fanOut.toSeq == fanSrc.map { case (c, n) => (c, 2 * n) }.toSeq)
  }

  test("documents: replica salting matches ScaleBench semantics, n_chars recomputed") {
    val reps = t("documents")
      .select(regexp_extract(col("text"), "replica_salt_(\\d+)$", 1).as("rep"))
      .groupBy("rep").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(reps == Map("0" -> src("documents").count(), "1" -> src("documents").count()))
    assert(t("documents").where(col("n_chars") =!= length(col("text"))).count() == 0)
  }

  test("events: replicas are time-shifted, per-window density constant") {
    // replica 1 (ids >= 1e9) starts exactly 35 days after replica 0's span
    val shift = t("events")
      .groupBy((col("event_id") >= 1000000000L).as("r1"))
      .agg(min(unix_micros(col("ts").cast("timestamp"))).as("lo"))
      .orderBy("r1").collect().map(_.getLong(1))
    assert(shift(1) - shift(0) == 35L * 86400L * 1000000L)
  }
}
