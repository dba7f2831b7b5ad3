package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All Graft queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * only the tables they need; parquet column pruning + filter pushdown do
  * the rest. `registerAll` exposes every table as a temp view for the SQL
  * transform path (SqlOp) — view registration is lazy metadata only.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet has carried TIMESTAMP(NANOS) (rejected by Spark's
    // reader unless nanosAsLong) and timestamp[us] across testdata
    // regenerations. Contract for all downstream operators: `ts` is
    // epoch-nanos LongType, whatever the file stores. nanosAsLong covers
    // the NANOS encoding; the match below converts timestamp readings
    // (micros * 1000 — exact; session timezone is UTC everywhere, so the
    // NTZ->TZ cast is the identity on the stored value).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // predicates on the normalized ts column rewrite back onto the raw
    // timestamp attribute so parquet row-group pruning still applies
    graft.plans.TsPushdown.install(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) |
           Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
      case _ => df
    }
  }

  /** Epoch-nanos long → timestamp (microsecond precision). */
  def nsToTimestamp(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros((c / 1000L).cast("long"))

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
