package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Column-shape transforms: field mapping, renaming, copying, keep/drop.
  *
  * Reference semantics:
  *  - FieldMapper: seatunnel-transforms-v2 .../fieldmapper/FieldMapperTransform.java:45
  *    (select a subset of fields, in given order, optionally renamed)
  *  - FieldRename: .../rename/FieldRenameTransform.java:55
  *    (bulk rename: case conversion, prefix/suffix, explicit pairs)
  *  - CopyField: .../copy/CopyFieldTransform.java:41
  *  - FilterField: .../filter/FilterFieldTransform.java:47
  *    (include or exclude lists)
  *
  * All are pure projections — they stay inside whole-stage codegen and cost
  * nothing at scale (Catalyst prunes unused columns down to the scan).
  */
object FieldOps {

  /** Project `mapping` keys in order, renaming to the mapped names.
    * Mirrors FieldMapper's `field_mapper = { src = dst, ... }`.
    */
  def fieldMapper(df: DataFrame, mapping: Seq[(String, String)]): DataFrame =
    df.select(mapping.map { case (src, dst) => col(src).as(dst) }: _*)

  /** Explicit rename pairs (src -> dst); unlisted columns pass through. */
  def renameFields(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** FieldRename convert_case = UPPER/LOWER over all column names. */
  def renameCase(df: DataFrame, upper: Boolean): DataFrame =
    df.withColumnsRenamed(
      df.columns.map(c => c -> (if (upper) c.toUpperCase else c.toLowerCase)).toMap)

  /** FieldRename prefix/suffix over all column names. */
  def renameAffix(df: DataFrame, prefix: String = "", suffix: String = ""): DataFrame =
    df.withColumnsRenamed(df.columns.map(c => c -> s"$prefix$c$suffix").toMap)

  /** Duplicate fields: each (src -> dst) adds a copy column at the end. */
  def copyFields(df: DataFrame, copies: Seq[(String, String)]): DataFrame =
    df.withColumns(copies.map { case (src, dst) => dst -> col(src) }.toMap)

  /** FilterField include mode: keep exactly these columns, in this order. */
  def keepFields(df: DataFrame, fields: Seq[String]): DataFrame =
    df.select(fields.map(col): _*)

  /** FilterField exclude mode: drop these columns. */
  def dropFields(df: DataFrame, fields: Seq[String]): DataFrame =
    df.drop(fields: _*)
}
