package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-key rolling / lag feature engineering over event time — the
  * feature-backfill companion to [[AsOfJoin]]: where as-of joins attach
  * the latest DIMENSION row, this derives per-entity history features
  * (rolling count/sum/mean over the last N events, previous value, time
  * since previous event) that training pipelines join onto examples.
  *
  * Spark-first shape: ONE hash exchange on the keys + ONE in-partition
  * sort feeds every window function (Catalyst collapses same-spec windows
  * into a single Window operator), so the cost is a single shuffle of the
  * events regardless of how many features ride on it. Sums run in
  * DECIMAL inside the frame and surface as double — exact, engine-neutral
  * arithmetic (float accumulation order is not part of the contract).
  *
  * Ordering is (ts, tieCol) so duplicate timestamps stay deterministic.
  */
object TimeSeries {

  def rollingFeatures(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, lastN: Int, tieCol: String): DataFrame = {
    require(keys.nonEmpty && lastN >= 1, "rollingFeatures: keys and lastN >= 1")
    val order = Seq(col(tsCol).asc, col(tieCol).asc)
    val frame = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(lastN - 1), Window.currentRow)
    val prev = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val dec = col(valueCol).cast(DecimalType(18, 2))
    // roll_n counts EVENTS in the frame; the mean divides by NON-NULL
    // values only — a null measurement must not drag the average down
    df.withColumn("roll_n", count(lit(1)).over(frame))
      .withColumn("roll_sum", sum(dec).over(frame).cast("double"))
      .withColumn("roll_mean",
        (sum(dec).over(frame).cast("double") / count(dec).over(frame)))
      .withColumn("prev_value", lag(col(valueCol), 1).over(prev))
      .withColumn("gap", col(tsCol) - lag(col(tsCol), 1).over(prev))
  }

  /** Per-group z-score anomaly flags: one DECIMAL-exact moments pass
    * (count/sum/sum-of-squares — one row per group), one codegen'd
    * projection computing `z = (v - mean)/sqrt(var)` per row.
    * The float arithmetic is a FIXED formula over exactly-aggregated
    * moments, so two engines agree bit-for-bit (sqrt is correctly rounded
    * by IEEE-754; only summation ORDER is engine-dependent, and the sums
    * happen in DECIMAL). Zero-variance groups yield null z, never a
    * divide-by-zero artifact.
    *
    * Cardinality contract: by default the stats table is BROADCAST back —
    * correct when the group-key cardinality is bounded (sources, shards,
    * sensors: thousands to low millions of groups). For high-cardinality
    * keys (per-user over 10^8 users) the one-row-per-group table exceeds
    * the broadcast limit — pass `hugeGroups = true` to join it with a
    * plain key shuffle instead (AQE still upgrades to broadcast at runtime
    * if the stats turn out small). Either way the events are exchanged at
    * most once on the keys.
    *
    * Group keys join NULL-SAFELY (`<=>`): rows whose key is null form a
    * group in the aggregation and keep their z in the output rather than
    * being dropped by the join.
    */
  def zScores(df: DataFrame, keys: Seq[String], valueCol: String,
      sigma: Double = 3.0, hugeGroups: Boolean = false): DataFrame = {
    val dec = col(valueCol).cast(DecimalType(18, 2))
    // moments over NON-NULL values only (null measurements carry no z)
    val stats = df.groupBy(keys.map(col): _*).agg(
      count(dec).as("__n"),
      sum(dec).cast("double").as("__sm"),
      sum(dec * dec).cast("double").as("__sq"))
    val mean = col("__sm") / col("__n")
    val variance = col("__sq") / col("__n") - mean * mean
    val d = df.as("__z_l")
    val s = (if (hugeGroups) stats else broadcast(stats)).as("__z_r")
    val cond = keys.map(k => col(s"__z_l.$k") <=> col(s"__z_r.$k")).reduce(_ && _)
    val left = df.columns.map(c => col(s"__z_l.$c").as(c))
    d.join(s, cond)
      .withColumn("z",
        when(variance > 0, (col(s"__z_l.$valueCol") - mean) / sqrt(variance)))
      .withColumn("is_anomaly", abs(col("z")) > sigma)
      .select(left.toSeq :+ col("z") :+ col("is_anomaly"): _*)
  }
}
