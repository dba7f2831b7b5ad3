package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (SURVEY §2.6 profiling scale path).
  *
  * [[Profile.profile]] answers "distinct count now" with one pass; these
  * ops make the sketch itself a first-class COLUMN (Apache DataSketches
  * HLL via Spark's built-in `hll_sketch_agg` family), so cardinality
  * composes across pipeline stages the way partial aggregates compose
  * inside one query: build per-partition/per-group sketches once, persist
  * them (bytes), union them later — across days, sources, or pipeline
  * stages — without rescanning the 100 TB base table. Union is
  * associative and commutative, so any merge tree gives the same
  * estimate; estimates are exact while a sketch is still in its
  * small-cardinality coupon mode (hundreds of values at the default
  * lgConfigK=12), which is what makes the driver query oracle-checkable.
  */
object Sketches {

  /** One HLL sketch of `valueCol` per `byCols` group (binary column
    * `sketch`). Map-side partial aggregation does the heavy lifting: each
    * partition builds a local sketch and only sketch bytes enter the
    * exchange.
    */
  def hllAgg(df: DataFrame, valueCol: String, byCols: Seq[String],
      lgConfigK: Int = 12): DataFrame = {
    val agg = hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch")
    if (byCols.isEmpty) df.agg(agg)
    else df.groupBy(byCols.map(col): _*).agg(agg)
  }

  /** Union previously built sketches per `byCols` group — the cross-stage
    * merge (e.g. daily sketches -> monthly cardinality). Only sketch bytes
    * shuffle.
    */
  def hllMerge(df: DataFrame, sketchCol: String, byCols: Seq[String]): DataFrame = {
    val agg = hll_union_agg(col(sketchCol)).as("sketch")
    if (byCols.isEmpty) df.agg(agg)
    else df.groupBy(byCols.map(col): _*).agg(agg)
  }

  /** Cardinality estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Pairwise union of two sketch columns (row-level compose). */
  def union(a: Column, b: Column): Column = hll_union(a, b)
}
