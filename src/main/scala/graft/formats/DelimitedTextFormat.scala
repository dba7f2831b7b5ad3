package graft.formats

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-column delimited text files (SURVEY §2.4).
  *
  * Mirrors the reference text format
  * (seatunnel-formats/seatunnel-format-text/.../TextDeserializationSchema.java:
  * one row per line, fields split on `field_delimiter`, nested
  * array/map values on the fixed level-2/3 separators from
  * TextFormatConstant.SEPARATOR, optional `null_format` token), the common
  * Hive-style legacy-ETL interchange file.
  *
  * Spark-first shape: read is `spark.read.text` (splittable, partitioned)
  * followed by ONE codegen'd projection — `split` + `element_at` +
  * `try_cast` per field, so a 100 TB input parses inside whole-stage
  * codegen with no UDF and no per-row interpreter. Write is the symmetric
  * projection into `concat_ws` + `spark.write.text` (one file per
  * partition, no driver funnel).
  */
object DelimitedTextFormat {

  /** Reference defaults (TextFormatConstant.SEPARATOR). */
  val DefaultFieldDelimiter = "\u0001"
  val DefaultArrayDelimiter = "\u0002"
  val DefaultKvDelimiter = "\u0003"

  final case class Config(
      fieldDelimiter: String = DefaultFieldDelimiter,
      arrayDelimiter: String = DefaultArrayDelimiter,
      kvDelimiter: String = DefaultKvDelimiter,
      nullFormat: String = "")

  private def parseField(raw: Column, dt: DataType, cfg: Config): Column = {
    // the null token reads back as null for every type; for scalars an
    // unparseable token degrades to null (try_cast) instead of failing the
    // whole scan under ANSI mode — the reference's lenient convert() path
    val s = when(raw === lit(cfg.nullFormat), lit(null).cast(StringType)).otherwise(raw)
    dt match {
      case StringType => s
      case ArrayType(et, _) =>
        transform(split(s, Pattern.quote(cfg.arrayDelimiter), -1),
          x => parseField(x, et, cfg))
      case MapType(kt, vt, _) =>
        map_from_entries(transform(split(s, Pattern.quote(cfg.arrayDelimiter), -1), kv =>
          struct(
            parseField(element_at(split(kv, Pattern.quote(cfg.kvDelimiter), 2), 1), kt, cfg),
            parseField(element_at(split(kv, Pattern.quote(cfg.kvDelimiter), 2), 2), vt, cfg))))
      case other => s.try_cast(other)
    }
  }

  def read(spark: SparkSession, path: String, schema: StructType,
      cfg: Config = Config()): DataFrame = {
    val raw = spark.read.text(path)
    val parts = split(col("value"), Pattern.quote(cfg.fieldDelimiter), -1)
    raw.select(schema.fields.zipWithIndex.map { case (f, i) =>
      parseField(element_at(parts, i + 1), f.dataType, cfg).as(f.name)
    }.toSeq: _*)
  }

  private def serField(c: Column, dt: DataType, cfg: Config): Column = dt match {
    case ArrayType(et, _) =>
      array_join(transform(c, x => serField(x, et, cfg)),
        cfg.arrayDelimiter, cfg.nullFormat)
    case MapType(_, _, _) =>
      array_join(transform(map_entries(c), e =>
          concat_ws(cfg.kvDelimiter,
            coalesce(serField(e.getField("key"), dt.asInstanceOf[MapType].keyType, cfg), lit(cfg.nullFormat)),
            coalesce(serField(e.getField("value"), dt.asInstanceOf[MapType].valueType, cfg), lit(cfg.nullFormat)))),
        cfg.arrayDelimiter)
    case _ => c.cast(StringType)
  }

  def write(df: DataFrame, path: String, cfg: Config = Config(),
      mode: String = "overwrite"): Unit = {
    val line = concat_ws(cfg.fieldDelimiter,
      df.schema.fields.map(f =>
        coalesce(serField(col(f.name), f.dataType, cfg), lit(cfg.nullFormat))).toSeq: _*)
    df.select(line.as("value")).write.mode(mode).text(path)
  }

  /** Build a Config from reference-style sink/source option names. */
  def configFrom(options: Map[String, String]): Config = Config(
    fieldDelimiter = options.getOrElse("field_delimiter", DefaultFieldDelimiter),
    arrayDelimiter = options.getOrElse("array_delimiter", DefaultArrayDelimiter),
    kvDelimiter = options.getOrElse("kv_delimiter", DefaultKvDelimiter),
    nullFormat = options.getOrElse("null_format", ""))
}
