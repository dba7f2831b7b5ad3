package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the data-QA complement to [[Scd2]] /
  * `Sinks.mergeInto`: those APPLY known changes; this RECOVERS the
  * change set between two materialized versions of a table (yesterday's
  * export vs today's, pre- vs post-backfill) and is the primitive
  * behind regression gates ("this pipeline change rewrote 40% of
  * n_name — really?").
  *
  * Spark-first shape: ONE full-outer join on the key (both sides
  * exchange once on the key, AQE handles skew) with NULL-SAFE key
  * equality; presence is tracked by literal marker columns, so rows
  * whose key columns are legitimately null still diff correctly.
  * Per-column comparison is null-safe `<=>`. Everything downstream of
  * the join is a codegen'd projection.
  */
object Diff {

  /** Row-level diff: one row per key present in either snapshot, with
    * `status` ∈ added | removed | changed | unchanged and one
    * `<col>_changed` boolean per compared column (false unless the key
    * exists in both). `compareCols` defaults to every shared non-key
    * column.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff: at least one key column")
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filter(newDf.columns.contains).filterNot(keys.contains).toSeq
    val o = oldDf.withColumn("__in_old", lit(true)).as("__d_o")
    val n = newDf.withColumn("__in_new", lit(true)).as("__d_n")
    val cond = keys.map(k => col(s"__d_o.$k") <=> col(s"__d_n.$k")).reduce(_ && _)
    val both = col("__in_old").isNotNull && col("__in_new").isNotNull
    val changedCols = cols.map(c =>
      coalesce(both && !(col(s"__d_o.$c") <=> col(s"__d_n.$c")), lit(false))
        .as(s"${c}_changed"))
    val anyChanged = cols.map(c => col(s"${c}_changed"))
      .foldLeft(lit(false))(_ || _)
    o.join(n, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"__d_o.$k"), col(s"__d_n.$k")).as(k)) ++
          Seq(col("__in_old"), col("__in_new")) ++ changedCols: _*)
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(anyChanged, "changed")
          .otherwise("unchanged"))
      .drop("__in_old", "__in_new")
  }

  /** Aggregate summary of [[snapshotDiff]]: row counts per status plus a
    * change count per compared column — one partial-agg pass over the
    * diff.
    */
  def diffSummary(diff: DataFrame): DataFrame = {
    val changedCols = diff.columns.filter(_.endsWith("_changed")).toSeq
    val aggs = Seq(
      count(when(col("status") === "added", 1)).as("n_added"),
      count(when(col("status") === "removed", 1)).as("n_removed"),
      count(when(col("status") === "changed", 1)).as("n_changed"),
      count(when(col("status") === "unchanged", 1)).as("n_unchanged")) ++
      changedCols.map(c => count(when(col(c), 1)).as(s"n_$c"))
    diff.agg(aggs.head, aggs.tail: _*)
  }
}
