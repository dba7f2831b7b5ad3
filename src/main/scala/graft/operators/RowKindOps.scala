package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC row-kind model.
  *
  * SeaTunnel rows carry a RowKind (INSERT +I, UPDATE_BEFORE -U,
  * UPDATE_AFTER +U, DELETE -D) — seatunnel-api .../type/RowKind.java.
  * Spark DataFrames have no row metadata, so Graft models kind as a
  * reserved `__row_kind` column holding the short form ("+I","-U","+U","-D").
  *
  * Reference transforms:
  *  - FilterRowKind: .../filterrowkind/FilterRowKindTransform.java:36
  *  - RowKindExtractor: .../rowkind/RowKindExtractorTransform.java:36
  */
object RowKindOps {
  val RowKindCol = "__row_kind"

  val shortToFull: Map[String, String] = Map(
    "+I" -> "INSERT", "-U" -> "UPDATE_BEFORE", "+U" -> "UPDATE_AFTER", "-D" -> "DELETE")

  /** Tag a kind-less DataFrame as an insert-only changelog. */
  def tagInserts(df: DataFrame): DataFrame =
    if (df.columns.contains(RowKindCol)) df else df.withColumn(RowKindCol, lit("+I"))

  /** Keep only rows whose kind is in `include` (FilterRowKind include mode). */
  def filterRowKind(df: DataFrame, include: Seq[String]): DataFrame =
    df.where(col(RowKindCol).isin(include: _*))

  /** Drop rows whose kind is in `exclude` (FilterRowKind exclude mode). */
  def filterRowKindExclude(df: DataFrame, exclude: Seq[String]): DataFrame =
    df.where(!col(RowKindCol).isin(exclude: _*))

  /** Materialize the kind into a user-visible column; format SHORT ("+I")
    * or FULL ("INSERT"), per RowKindExtractor's `transform_format`.
    */
  def extractRowKind(df: DataFrame, outputField: String, full: Boolean = false): DataFrame = {
    // kind-less rows are implicit inserts (FakeSource emits plain rows) —
    // same convention as filterRowKind
    val kind =
      if (df.columns.contains(RowKindCol)) col(RowKindCol) else lit("+I")
    val value =
      if (!full) kind
      else shortToFull.foldLeft(lit(null).cast("string")) { case (acc, (s, f)) =>
        when(kind === s, lit(f)).otherwise(acc)
      }
    df.withColumn(outputField, value)
  }
}
