package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType, StructType}

/** JsonPath extraction transform.
  *
  * Reference: seatunnel-transforms-v2 .../jsonpath/JsonPathTransform.java:48
  * — per column config {src_field, path, dest_field, dest_type,
  * column_error_handle_way}, evaluated with com.jayway.jsonpath per row,
  * with a row-level row_error_handle_way default
  * (.../common/ErrorHandleWay.java: FAIL | SKIP | SKIP_ROW).
  *
  * Graft maps each JSONPath onto Spark's codegen'd `get_json_object`
  * (supports the $.a.b[0] subset that covers the reference's documented
  * examples) with an optional cast. Non-string sources take the typed
  * fast path the reference reaches via JSON re-serialization: `$[i]` on a
  * ROW column is positional struct-field access, on an ARRAY column it is
  * element access, and `$.f` chains are struct/map field lookups — all
  * columnar, no JSON round trip. Extraction happens inside whole-stage
  * codegen — no per-row JSON library dispatch.
  *
  * Error semantics (one pass, no pre-scan):
  *  - SKIP (Graft's default): an unextractable path yields null — Spark's
  *    native missing-field behavior.
  *  - FAIL: any row with a non-null source but null extraction raises,
  *    failing the job (reference default).
  *  - SKIP_ROW: rows where the column fails to extract are dropped.
  */
object JsonPathOp {

  sealed trait ErrorHandleWay
  object ErrorHandleWay {
    case object Fail extends ErrorHandleWay
    case object Skip extends ErrorHandleWay
    case object SkipRow extends ErrorHandleWay
    def parse(s: String): ErrorHandleWay = s.trim.toUpperCase match {
      case "FAIL" => Fail
      case "SKIP" => Skip
      case "SKIP_ROW" => SkipRow
      case other => throw new IllegalArgumentException(s"error_handle_way: $other")
    }
  }

  final case class PathSpec(
      srcField: String,
      path: String,
      destField: String,
      destType: Option[DataType] = None,
      errorHandleWay: Option[ErrorHandleWay] = None)

  private val IndexPath = """\$\[(\d+)\]""".r
  private val DotPath = """\$((?:\.[A-Za-z_][A-Za-z0-9_]*)+)""".r

  /** The raw (pre-cast) extraction column for `spec` against `srcType`. */
  private def rawColumn(spec: PathSpec, srcType: DataType): Column = {
    val src = col(spec.srcField)
    (srcType, spec.path) match {
      case (st: StructType, IndexPath(i)) =>
        val idx = i.toInt
        require(idx < st.fields.length,
          s"JsonPath ${spec.path}: struct ${spec.srcField} has ${st.fields.length} fields")
        src.getField(st.fields(idx).name)
      case (_: ArrayType, IndexPath(i)) => element_at(src, i.toInt + 1)
      case (_: StructType | _: MapType, DotPath(fields)) =>
        fields.split('.').filter(_.nonEmpty).foldLeft(src)(_.getField(_))
      case (StringType, _) => get_json_object(src, spec.path)
      case (other, _) =>
        // last resort: serialize once, then JSON-path it (the reference's
        // universal row->json->jayway route)
        get_json_object(to_json(src), spec.path)
    }
  }

  def extract(df: DataFrame, specs: Seq[PathSpec],
      rowErrorHandleWay: ErrorHandleWay = ErrorHandleWay.Skip): DataFrame = {
    val srcTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def way(s: PathSpec): ErrorHandleWay = s.errorHandleWay.getOrElse(rowErrorHandleWay)

    val extracted = df.withColumns(specs.map { spec =>
      val srcType = srcTypes.getOrElse(spec.srcField,
        throw new IllegalArgumentException(s"JsonPath: no column ${spec.srcField}"))
      val raw = rawColumn(spec, srcType)
      // the reference's lenient json-smart parse unquotes single-quoted
      // values ('2023-10-29' -> 2023-10-29) before temporal conversion
      // (JsonToRowConverters.convertToLocalDate); mirror that for casts
      def dequoted(c: Column) = regexp_replace(c.cast(StringType), "^'(.*)'$", "$1")
      val value = spec.destType.fold(raw) {
        case t @ (org.apache.spark.sql.types.DateType |
                  org.apache.spark.sql.types.TimestampType |
                  _: org.apache.spark.sql.types.TimeType) => dequoted(raw).cast(t)
        case t => raw.cast(t)
      }
      val out = way(spec) match {
        case ErrorHandleWay.Fail =>
          when(col(spec.srcField).isNotNull && value.isNull,
            raise_error(concat(lit(s"JsonPath FAIL: path ${spec.path} of field " +
              s"${spec.srcField} did not match for row with value: "),
              col(spec.srcField).cast("string")))).otherwise(value)
        case _ => value
      }
      spec.destField -> out
    }.toMap)

    val skipRowSpecs = specs.filter(s => way(s) == ErrorHandleWay.SkipRow)
    if (skipRowSpecs.isEmpty) extracted
    else extracted.where(skipRowSpecs.map(s =>
      col(s.srcField).isNull || col(s.destField).isNotNull).reduce(_ && _))
  }

  /** Whole-document parse when a schema is known: single from_json pass,
    * then struct field access — cheaper than N independent path scans.
    */
  def parseWithSchema(df: DataFrame, srcField: String, schema: DataType, destField: String): DataFrame =
    df.withColumn(destField, from_json(col(srcField), schema))
}
