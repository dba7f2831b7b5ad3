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
    df.withColumn("roll_n", count(lit(1)).over(frame))
      .withColumn("roll_sum", sum(dec).over(frame).cast("double"))
      .withColumn("roll_mean",
        (sum(dec).over(frame).cast("double") / count(lit(1)).over(frame)))
      .withColumn("prev_value", lag(col(valueCol), 1).over(prev))
      .withColumn("gap", col(tsCol) - lag(col(tsCol), 1).over(prev))
  }
}
