package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for every left row, the single latest right
  * row with `rightTs <= leftTs` in the same key group, optionally within a
  * tolerance window — the time-series join behind feature backfills ("the
  * price as of this trade", "the model version as of this event"). Left
  * rows with no qualifying right row keep nulls (left-outer semantics,
  * matching DuckDB/pandas ASOF LEFT).
  *
  * Spark-first shape: the naive formulation is a range join
  * (`l.ts >= r.ts` + row_number), which Catalyst can only execute as a
  * per-key cartesian — O(|L|·|R|) per key, hopeless at scale. This is the
  * union-tag algorithm instead: tag both sides, align schemas, union,
  * then ONE hash exchange on the key and ONE in-partition sort by
  * (ts, side) feed a running `last(…, ignoreNulls)` window that carries
  * the latest right payload forward onto each left row. Total cost is a
  * single shuffle + sort over |L|+|R| rows — the kdb/pandas merge-asof
  * shape, expressed as a Spark window so AQE/codegen apply.
  *
  * The right payload rides as ONE struct column: a legitimately-null value
  * INSIDE a matched right row is preserved, where per-column
  * `last(ignoreNulls)` would skip back to an older non-null value (the
  * classic as-of implementation bug).
  *
  * Ties: a right row at exactly `leftTs` matches (`<=`); right rows are
  * ordered before left rows at equal ts. Callers wanting determinism under
  * duplicate (key, rightTs) right rows should de-duplicate first — any
  * sort-based as-of (including DuckDB's) is tie-arbitrary there.
  */
object AsOfJoin {

  /** @param tolerance max allowed `leftTs - rightTs` (same units as the ts
    *                  columns); matches older than this become null.
    * @param rightPrefix prepended to right payload columns in the output
    *                    (collision-proofing; keys are not duplicated).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Long] = None,
      rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asOf: at least one key column")
    val lCols = left.columns.toSeq
    val lPayload = lCols.filterNot(keys.contains)
    val rPayload = right.columns.toSeq.filterNot(keys.contains)
    val rStructType = StructType(rPayload.map(c => right.schema(c).copy(nullable = true)))

    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        lPayload.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rSide = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rPayload.map(col): _*).as("__r"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lSide.unionByName(rSide)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))

    val withinTol: Column = tolerance
      .map(t => col("__match").getField(rightTs) >= col("__ts") - lit(t))
      .getOrElse(lit(true))
    val matched = when(col("__match").isNotNull && withinTol, col("__match"))
    carried.where(col("__side") === 1)
      .select(lCols.map(col) ++
        rPayload.map(c => matched.getField(c).as(rightPrefix + c)): _*)
  }
}
