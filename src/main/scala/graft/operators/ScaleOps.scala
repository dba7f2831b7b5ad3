package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-engineering helpers (SURVEY §5): explicit tools for the two shuffle
  * pathologies that dominate 100 TB joins — skewed keys and repeated
  * co-partitioned joins.
  *
  * AQE (on by default) already splits skewed sort-merge partitions at
  * runtime; `saltedJoin` is the static fallback for keys so hot that even a
  * split partition exceeds executor memory (e.g. the null/default key of a
  * fact table). `writeBucketed`/co-located reads eliminate the shuffle
  * entirely for join keys that are reused across many queries.
  */
object ScaleOps {

  /** Skew-safe equi-join: the (large, skewed) left side gets a uniform salt
    * in [0, saltFactor); the right side is replicated saltFactor times, so
    * every hot key spreads over saltFactor reducers. Inner/left joins only
    * (replication would break right-side multiplicity otherwise).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val salted = large.withColumn("__salt",
      floor(rand(42) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Write a table hash-bucketed (and sorted) by the join keys. Reading two
    * tables bucketed the same way joins WITHOUT a shuffle exchange — the
    * payoff at 100 TB when a key is joined repeatedly (fact-to-fact).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String],
      path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    // explicit path → external table: callers control where the bucketed
    // data lands instead of the session's warehouse directory
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two same-bucketing tables; with matched bucket counts Catalyst
    * plans a sort-merge join with zero Exchange on either side.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
