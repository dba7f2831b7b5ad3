package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Metadata injection transform.
  *
  * Reference: seatunnel-transforms-v2 .../metadata/MetadataTransform.java:42
  * — maps connector metadata (Database, Table, RowKind, EventTime, Delay,
  * Partition) into user columns.
  *
  * Graft's metadata sources: pipeline-declared database/table names,
  * `__row_kind` (RowKindOps), an event-time column, processing time, and
  * the file-based `input_file_name()` for file sources.
  */
object MetadataOp {

  final case class MetaConfig(
      database: Option[String] = None,
      table: Option[String] = None,
      eventTimeField: Option[String] = None)

  /** Inject requested metadata columns. `fields` maps metadata key
    * (Database|Table|RowKind|EventTime|ProcessingTime|Delay|SourceFile)
    * to the output column name, mirroring the reference's `metadata_fields`.
    */
  def inject(df: DataFrame, fields: Map[String, String], cfg: MetaConfig = MetaConfig()): DataFrame =
    df.withColumns(fields.map { case (key, out) =>
      val value = key match {
        case "Database" => lit(cfg.database.orNull)
        case "Table" => lit(cfg.table.orNull)
        case "RowKind" =>
          if (df.columns.contains(RowKindOps.RowKindCol)) col(RowKindOps.RowKindCol) else lit("+I")
        case "EventTime" => cfg.eventTimeField.map(col).getOrElse(lit(null).cast("timestamp"))
        case "ProcessingTime" => current_timestamp()
        case "Delay" =>
          cfg.eventTimeField
            .map(f => current_timestamp().cast("double") - col(f).cast("double"))
            .getOrElse(lit(null).cast("double"))
        case "SourceFile" => input_file_name()
        case other => throw new IllegalArgumentException(s"unknown metadata key: $other")
      }
      out -> value
    }.toMap)
}
