package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.GraftCaches.PersistOps

/** File source connector (local/HDFS/S3-style paths all go through the same
  * Hadoop FileSystem API — at 100 TB this is the partitioned-scan path with
  * predicate pushdown and column pruning from Catalyst).
  *
  * Reference: seatunnel-connectors-v2/connector-file (LocalFile source with
  * file_format_type parquet/orc/json/csv/text/excel/xml + schema options).
  */
object FileSources {

  final case class FileSourceConfig(
      path: String,
      format: String, // parquet | orc | json | csv | text
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty)

  def read(spark: SparkSession, cfg: FileSourceConfig): DataFrame = {
    val fmt = cfg.format.toLowerCase
    val defaults: Map[String, String] = fmt match {
      // reference csv defaults: delimiter ',', header detection off
      case "csv" => Map("delimiter" -> ",", "header" -> "false", "inferSchema" -> "false")
      case _ => Map.empty
    }
    var r: DataFrameReader = spark.read.options(defaults ++ cfg.options)
    cfg.schema.foreach(s => r = r.schema(s))
    fmt match {
      case "parquet" => r.parquet(cfg.path)
      case "orc" => r.orc(cfg.path)
      case "json" => r.json(cfg.path)
      case "csv" => r.csv(cfg.path)
      // a multi-column schema (or an explicit field_delimiter) selects the
      // reference's delimited text format; otherwise Spark's raw one-column
      // text reader
      case "text" if cfg.schema.exists(_.length > 1) || cfg.options.contains("field_delimiter") =>
        graft.formats.DelimitedTextFormat.read(spark, cfg.path,
          cfg.schema.getOrElse(throw new IllegalArgumentException(
            "delimited text source requires a schema")),
          graft.formats.DelimitedTextFormat.configFrom(cfg.options))
      case "text" => r.text(cfg.path)
      // Spark 4 native XML (reference: connector-file xml file_format_type);
      // rowTag comes through options, default matches the reference docs.
      case "xml" => r.option("rowTag", cfg.options.getOrElse("rowTag", "RECORD")).xml(cfg.path)
      // whole-file binary rows (reference BINARY file-copy format;
      // graft.sources.BinaryFiles over Spark's binaryFile datasource)
      case "binary" => BinaryFiles.read(spark, cfg.path, cfg.options)
      // Avro container files via the Avro Java API + Hadoop input format
      // (splittable; see graft.formats.AvroFormat)
      case "avro" => graft.formats.AvroFormat.read(spark, cfg.path, cfg.schema)
      // OOXML SpreadsheetML via JDK zip + StAX (graft.formats.ExcelFormat)
      case "excel" => graft.formats.ExcelFormat.read(spark, cfg.path, cfg.schema,
        cfg.options.getOrElse("header", "true").toBoolean)
      case other => throw new IllegalArgumentException(s"unsupported file format: $other")
    }
  }

  /** Dirty-data tolerant read (the reference connectors' dirty-row
    * handling): parse json/csv PERMISSIVE-ly against the declared schema,
    * route unparseable lines to a dead-letter directory as raw text, and
    * return only the clean rows. One read pass (the parsed frame is
    * persisted because Spark refuses to filter on the internal corrupt
    * column of an unpersisted scan); the DLQ write streams the bad rows
    * distributed.
    */
  def readWithDeadLetter(spark: SparkSession, cfg: FileSourceConfig,
      dlqPath: String): DataFrame = {
    val schema = cfg.schema.getOrElse(
      throw new IllegalArgumentException("dead-letter read requires an explicit schema"))
    require(Seq("json", "csv").contains(cfg.format.toLowerCase),
      s"dead-letter read supports json/csv, got ${cfg.format}")
    val corrupt = "_corrupt_record"
    val withCorrupt = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(corrupt,
        org.apache.spark.sql.types.StringType))
    val r = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .options(cfg.options)
    val parsed = (cfg.format.toLowerCase match {
      case "json" => r.json(cfg.path)
      case "csv" => r.option("header", cfg.options.getOrElse("header", "false")).csv(cfg.path)
    }).graftPersist
    val bad = parsed.where(org.apache.spark.sql.functions.col(corrupt).isNotNull)
      .select(org.apache.spark.sql.functions.col(corrupt).as("value"))
    bad.write.mode("append").text(dlqPath)
    parsed.where(org.apache.spark.sql.functions.col(corrupt).isNull).drop(corrupt)
  }
}
