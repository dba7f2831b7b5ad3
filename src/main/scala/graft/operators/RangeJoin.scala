package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range joins: point-in-interval and interval-overlap joins that
  * need NO equality key. Spark executes a keyless theta join (`p.ts BETWEEN
  * i.lo AND i.hi`) as BroadcastNestedLoopJoin or CartesianProduct —
  * O(|P|·|I|) row comparisons, hopeless at 100 TB. The classic fix
  * (Sybase/DB2 "band join"; Databricks' range-join hint) is binning: slice
  * the time axis into fixed-width bins, replicate each interval into the
  * bins it covers, bucket each point into its one bin, and equi-join on
  * the bin id — the theta predicate then runs only within a bin's
  * candidates. Cost: one hash exchange on the bin id (plus any equality
  * keys) and per-interval replication of ceil(len/binWidth)+1 rows.
  *
  * Exactly-once output without a dedup exchange: a point lies in exactly
  * one bin, so point-in-interval pairs can't duplicate; for
  * interval-overlap, a pair shares every bin both cover, so the match is
  * kept only in the CANONICAL bin — the bin of `greatest(lStart, rStart)`,
  * the overlap's start, which both sides necessarily cover.
  *
  * Bin arithmetic stays in longs end to end (`DIV`, `pmod`): epoch-nano
  * timestamps (~1.7e18) exceed double's 53-bit mantissa, so a
  * floor(ts / width) through doubles can land values on the wrong bin
  * boundary. Bounds are inclusive on both ends, matching SQL BETWEEN.
  *
  * Choosing binWidth: ~the typical interval length. Too small → high
  * replication (len/width copies per interval); too large → many
  * candidates per bin. Both ends degrade gracefully — the join stays an
  * equi-join either way. Intervals with start > end are dropped (Spark's
  * `sequence(a, b)` would otherwise generate a DESCENDING bin range and
  * silently replicate garbage).
  *
  * Reference analogue: SeaTunnel has no range join; its SQL transform
  * delegates theta joins to the underlying engine row-at-a-time
  * (seatunnel-transforms-v2/src/main/java/org/apache/seatunnel/transform/sql).
  * This is the Spark-native scale path for the same query shape.
  */
object RangeJoin {

  /** floor(c / w) in pure long arithmetic: pmod is the non-negative
    * remainder, so (c - pmod(c, w)) is an exact multiple of w and the
    * integral DIV is exact floor division for any sign of c.
    */
  private def binOf(c: Column, w: Long): Column =
    call_function("div", (c - pmod(c, lit(w))).cast("long"), lit(w))

  private def prefixed(right: DataFrame, keys: Seq[String], prefix: String): Seq[(String, Column)] =
    right.columns.toSeq.filterNot(keys.contains).map(c => (prefix + c) -> col(c))

  /** Every (point, interval) pair with `start <= point <= end` (and equal
    * `keys`, if any). Interval payload columns come back prefixed.
    *
    * @param binWidth bin size in the units of the three range columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String, binWidth: Long,
      keys: Seq[String] = Nil, intervalPrefix: String = "i_"): DataFrame = {
    require(binWidth > 0, s"pointInInterval: binWidth must be positive, got $binWidth")
    val iPay = prefixed(intervals, keys, intervalPrefix)
    val i = intervals.select(
      keys.map(col) ++ iPay.map { case (n, c) => c.as(n) }: _*)
      .where(col(intervalPrefix + startCol) <= col(intervalPrefix + endCol))
      .withColumn("__bin", explode(sequence(
        binOf(col(intervalPrefix + startCol), binWidth),
        binOf(col(intervalPrefix + endCol), binWidth))))
    val p = points.withColumn("__bin", binOf(col(pointCol), binWidth))
    p.join(i, keys :+ "__bin")
      .where(col(pointCol) >= col(intervalPrefix + startCol) &&
             col(pointCol) <= col(intervalPrefix + endCol))
      .drop("__bin")
  }

  /** Every (left, right) interval pair that overlaps — touch counts
    * (`lStart <= rEnd AND rStart <= lEnd`) — with equal `keys`, if any.
    * Right payload columns come back prefixed. Each overlapping pair is
    * emitted exactly once (canonical-bin rule), with no distinct pass.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStartCol: String, lEndCol: String, rStartCol: String, rEndCol: String,
      binWidth: Long, keys: Seq[String] = Nil, rightPrefix: String = "r_"): DataFrame = {
    require(binWidth > 0, s"intervalOverlap: binWidth must be positive, got $binWidth")
    val rPay = prefixed(right, keys, rightPrefix)
    val rs = rightPrefix + rStartCol
    val re = rightPrefix + rEndCol
    val l = left
      .where(col(lStartCol) <= col(lEndCol))
      .withColumn("__bin", explode(sequence(
        binOf(col(lStartCol), binWidth), binOf(col(lEndCol), binWidth))))
    val r = right.select(keys.map(col) ++ rPay.map { case (n, c) => c.as(n) }: _*)
      .where(col(rs) <= col(re))
      .withColumn("__bin", explode(sequence(
        binOf(col(rs), binWidth), binOf(col(re), binWidth))))
    l.join(r, keys :+ "__bin")
      .where(col(lStartCol) <= col(re) && col(rs) <= col(lEndCol) &&
             col("__bin") === binOf(greatest(col(lStartCol), col(rs)), binWidth))
      .drop("__bin")
  }
}
