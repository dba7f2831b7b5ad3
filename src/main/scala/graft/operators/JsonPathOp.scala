package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** JsonPath extraction transform.
  *
  * Reference: seatunnel-transforms-v2 .../jsonpath/JsonPathTransform.java:48
  * — per column config {src_field, path, dest_field, dest_type}, evaluated
  * with com.jayway.jsonpath per row.
  *
  * Graft maps each JSONPath onto Spark's codegen'd `get_json_object`
  * (supports the $.a.b[0] subset that covers the reference's documented
  * examples) with an optional cast. Extraction happens columnar inside
  * whole-stage codegen — no per-row JSON library dispatch.
  */
object JsonPathOp {

  final case class PathSpec(
      srcField: String,
      path: String,
      destField: String,
      destType: Option[DataType] = None)

  def extract(df: DataFrame, specs: Seq[PathSpec]): DataFrame =
    df.withColumns(specs.map { spec =>
      val raw: Column = get_json_object(col(spec.srcField), spec.path)
      spec.destField -> spec.destType.fold(raw)(raw.cast)
    }.toMap)

  /** Whole-document parse when a schema is known: single from_json pass,
    * then struct field access — cheaper than N independent path scans.
    */
  def parseWithSchema(df: DataFrame, srcField: String, schema: DataType, destField: String): DataFrame =
    df.withColumn(destField, from_json(col(srcField), schema))
}
