package graft.formats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-column delimited text files (SURVEY §2.4).
  *
  * Mirrors the reference text format
  * (seatunnel-formats/seatunnel-format-text/.../TextDeserializationSchema.java:
  * one row per line, fields split on `field_delimiter`, nested
  * array/map/row values on DEPTH-INDEXED separators — the
  * TextFormatConstant.SEPARATOR ladder "".."", where a
  * value nested at level L splits its parts on SEPARATOR[L+1] and a map
  * additionally splits each entry on SEPARATOR[L+2] — optional
  * `null_format` token), the common Hive-style legacy-ETL interchange
  * file.
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
  val Separators: IndexedSeq[String] =
    (1 to 7).map(i => i.toChar.toString)
  val DefaultFieldDelimiter = ""
  val DefaultArrayDelimiter = ""
  val DefaultKvDelimiter = ""

  /** `fieldDelimiter` is a REGEX, like the reference's String.split
    * (its e2e configs pass escaped forms such as `"\\|"`); writes emit
    * it literally, also like the reference (TextSerializationSchema
    * String.join).
    */
  final case class Config(
      fieldDelimiter: String = DefaultFieldDelimiter,
      nullFormat: String = "",
      dateFormat: String = "yyyy-MM-dd",
      datetimeFormat: String = "yyyy-MM-dd HH:mm:ss",
      timeFormat: String = "HH:mm:ss") {
    /** separator at nesting level L (0 = top-level field split): level 0
      * honors the configured field_delimiter, deeper levels are the fixed
      * reference ladder (TextDeserializationSchema.java:210,233,274).
      */
    def sep(level: Int): String =
      if (level == 0) fieldDelimiter else Separators(level)

    /** write-side separator: regex escapes unwrap so an escaped read
      * delimiter (`"\\|"`) round-trips to the literal character it
      * matches (the reference writes with String.join, reads with
      * String.split — the regex form only ever appears on reads).
      */
    def writeSep(level: Int): String =
      if (level == 0) fieldDelimiter.replaceAll("""\\(.)""", "$1")
      else Separators(level)
  }

  private def parseField(raw: Column, dt: DataType, level: Int, cfg: Config): Column = {
    // the null token reads back as null for every type; for scalars an
    // unparseable token degrades to null (try_cast) instead of failing the
    // whole scan under ANSI mode — the reference's lenient convert() path
    val s = when(raw === lit(cfg.nullFormat), lit(null).cast(StringType)).otherwise(raw)
    dt match {
      case StringType => s
      case ArrayType(et, _) =>
        transform(split(s, cfg.sep(level + 1), -1),
          x => parseField(x, et, level + 1, cfg))
      case MapType(kt, vt, _) =>
        // try_element_at: a malformed entry (missing kv separator)
        // degrades to null value, like the reference's lenient convert
        map_from_entries(transform(split(s, cfg.sep(level + 1), -1), kv =>
          struct(
            parseField(try_element_at(split(kv, cfg.sep(level + 2), 2), lit(1)), kt, level + 1, cfg),
            parseField(try_element_at(split(kv, cfg.sep(level + 2), 2), lit(2)), vt, level + 1, cfg))))
      case st: StructType =>
        // reference nested-row syntax (TextDeserializationSchema.java:338):
        // the row's fields split on the NEXT level's separator
        val parts = split(s, cfg.sep(level + 1), -1)
        struct(st.fields.zipWithIndex.map { case (f, i) =>
          parseField(try_element_at(parts, lit(i + 1)), f.dataType, level + 1, cfg).as(f.name)
        }.toSeq: _*)
      case TimestampType =>
        // reference DateTimeUtils: configurable pattern, with ISO 'T' form
        // accepted interchangeably (e2e_time_format.txt mixes both)
        coalesce(try_to_timestamp(s, lit(cfg.datetimeFormat)),
          try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss")),
          s.try_cast(TimestampType))
      case DateType =>
        coalesce(try_to_timestamp(s, lit(cfg.dateFormat)).cast(DateType),
          s.try_cast(DateType))
      case other => s.try_cast(other)
    }
  }

  def read(spark: SparkSession, path: String, schema: StructType,
      cfg: Config = Config()): DataFrame =
    readLines(spark.read.text(path), schema, cfg)

  /** Parse pre-read lines (a `value` frame — from `spark.read.text` or an
    * archive expansion) with the same projection. Non-`value` columns
    * (Hive-style partition-dir fields like `name=x/hobby=y`, which the
    * reference surfaces as row fields) ride along appended after the
    * schema fields.
    */
  def readLines(lines: DataFrame, schema: StructType,
      cfg: Config = Config()): DataFrame = {
    val parts = split(col("value"), cfg.sep(0), -1)
    val extras = lines.columns.filterNot(_ == "value").toSeq
    lines.select(schema.fields.zipWithIndex.map { case (f, i) =>
      parseField(try_element_at(parts, lit(i + 1)), f.dataType, 0, cfg).as(f.name)
    }.toSeq ++ extras.map(col): _*)
  }

  private def serField(c: Column, dt: DataType, level: Int, cfg: Config): Column = dt match {
    case ArrayType(et, _) =>
      array_join(transform(c, x => serField(x, et, level + 1, cfg)),
        cfg.writeSep(level + 1), cfg.nullFormat)
    case mt: MapType =>
      array_join(transform(map_entries(c), e =>
          concat_ws(cfg.writeSep(level + 2),
            coalesce(serField(e.getField("key"), mt.keyType, level + 1, cfg), lit(cfg.nullFormat)),
            coalesce(serField(e.getField("value"), mt.valueType, level + 1, cfg), lit(cfg.nullFormat)))),
        cfg.writeSep(level + 1))
    case st: StructType =>
      concat_ws(cfg.writeSep(level + 1), st.fields.map(f =>
        coalesce(serField(c.getField(f.name), f.dataType, level + 1, cfg),
          lit(cfg.nullFormat))).toSeq: _*)
    case TimestampType => date_format(c, cfg.datetimeFormat)
    case _ => c.cast(StringType)
  }

  /** Serialize a frame to its one-column `value` line form — shared by
    * the batch writer and streaming file sinks (writeStream text takes a
    * single column). `keep` columns (partitioning) ride along untouched.
    */
  def toLines(df: DataFrame, cfg: Config = Config(),
      keep: Seq[String] = Nil): DataFrame = {
    val line = concat_ws(cfg.writeSep(0),
      df.schema.fields.filterNot(f => keep.contains(f.name)).map(f =>
        coalesce(serField(col(f.name), f.dataType, 0, cfg), lit(cfg.nullFormat))).toSeq: _*)
    df.select(line.as("value") +: keep.map(col): _*)
  }

  def write(df: DataFrame, path: String, cfg: Config = Config(),
      mode: String = "overwrite"): Unit =
    toLines(df, cfg).write.mode(mode).text(path)

  /** Build a Config from reference-style sink/source option names
    * (`delimiter` is the LocalFile source's legacy alias for
    * `field_delimiter`).
    */
  def configFrom(options: Map[String, String]): Config = Config(
    fieldDelimiter = options.get("field_delimiter")
      .orElse(options.get("delimiter")).getOrElse(DefaultFieldDelimiter),
    nullFormat = options.getOrElse("null_format", ""),
    dateFormat = options.getOrElse("date_format", "yyyy-MM-dd"),
    datetimeFormat = options.getOrElse("datetime_format", "yyyy-MM-dd HH:mm:ss"),
    timeFormat = options.getOrElse("time_format", "HH:mm:ss"))
}
