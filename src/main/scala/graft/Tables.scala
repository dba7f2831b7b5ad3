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
    // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    // rejects by default; read nanos as epoch-nanos LongType instead
    // (convert with nsToTimestamp where event-time semantics are needed).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Epoch-nanos long → timestamp (microsecond precision). */
  def nsToTimestamp(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros((c / 1000L).cast("long"))

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
