package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types._

/** The reference's schema grammar -> Spark types.
  *
  * Reference connector configs declare source schemas as nested HOCON
  * (`schema = { fields { c_int = int, c_row = { ... } } }`) with the zeta
  * type vocabulary (seatunnel-api SeaTunnelDataTypeConvertorUtil:
  * tinyint/smallint/int/bigint/float/double/decimal(p,s)/string/boolean/
  * bytes/date/time/timestamp/null, `array<T>`, `map<K, V>`, and nested
  * row objects). Spark's own `DataType.fromDDL` covers most spellings but
  * not `bytes`, bare `null`, or nested-object rows — this converter does.
  */
object ZetaSchema {

  private val DecimalRe = """(?i)decimal\s*\((\d+)\s*,\s*(\d+)\)""".r
  // DOTALL: inline row specs inside generic args may span lines
  private val ArrayRe = """(?is)array\s*<(.+)>""".r
  private val MapRe = """(?is)map\s*<(.+)>""".r

  /** Split `map<K, V>` args on the top-level comma (K may itself be a
    * generic type).
    */
  private def splitTopLevel(s: String): (String, String) = {
    var depth = 0
    s.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '<' | '(' | '{' => depth += 1
        case '>' | ')' | '}' => depth -= 1
        case ',' if depth == 0 => return (s.substring(0, i), s.substring(i + 1))
        case _ =>
      }
    }
    throw new IllegalArgumentException(s"bad map type args: $s")
  }

  /** Inline row specs inside generic types (the reference's
    * `map<string, {c_int=int, c_string=string}>` forms — separators may be
    * commas or newlines, keys/values may be JSON-quoted, rows nest).
    */
  private[graft] def parseInlineRow(s: String): scala.collection.immutable.ListMap[String, Any] = {
    val body = s.trim.stripPrefix("{").stripSuffix("}")
    // split on top-level commas/newlines only
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    body.foreach {
      case c @ ('{' | '<' | '(') => depth += 1; cur.append(c)
      case c @ ('}' | '>' | ')') => depth -= 1; cur.append(c)
      case c @ (',' | '\n') if depth == 0 =>
        if (cur.nonEmpty) { parts += cur.toString; cur.clear() }
        val _ = c
      case c => cur.append(c)
    }
    if (cur.nonEmpty) parts += cur.toString
    def unquote(x: String): String = {
      val t = x.trim
      if (t.length >= 2 && t.head == '"' && t.last == '"') t.substring(1, t.length - 1) else t
    }
    scala.collection.immutable.ListMap(parts.toSeq.flatMap { kv =>
      val (k, v) = splitKeyValue(kv)
      if (k.isEmpty) None
      else if (v.trim.startsWith("{")) // rows nest
        Some(unquote(k) -> (parseInlineRow(v): Any))
      else Some(unquote(k) -> (unquote(v): Any))
    }: _*)
  }

  /** First top-level `=` or `:` splits key from value. */
  private def splitKeyValue(kv: String): (String, String) = {
    var depth = 0
    kv.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '{' | '<' | '(' => depth += 1
        case '}' | '>' | ')' => depth -= 1
        case '=' | ':' if depth == 0 =>
          return (kv.substring(0, i).trim, kv.substring(i + 1).trim)
        case _ =>
      }
    }
    (kv.trim, "")
  }

  def dataTypeOf(t: Any): DataType = t match {
    // nested row declared as an object of fields
    case m: scala.collection.Map[_, _] =>
      structType(m.toSeq.map { case (k, v) => k.toString -> (v: Any) })
    case s: String => s.trim.toLowerCase match {
      case "string" | "varchar" => StringType
      case "boolean" => BooleanType
      case "tinyint" | "byte" => ByteType
      case "smallint" | "short" => ShortType
      case "int" | "integer" => IntegerType
      case "bigint" | "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "bytes" | "binary" => BinaryType
      case "date" => DateType
      case "timestamp" | "datetime" | "timestamp_tz" => TimestampType
      case "null" => StringType // the reference's null column carries no values
      case DecimalRe(p, sc) => DecimalType(p.toInt, sc.toInt)
      case ArrayRe(et) => ArrayType(dataTypeOf(et))
      case MapRe(args) =>
        val (kt, vt) = splitTopLevel(args)
        val valueType =
          if (vt.trim.startsWith("{")) dataTypeOf(parseInlineRow(vt))
          else dataTypeOf(vt)
        MapType(dataTypeOf(kt), valueType)
      case "time" => // Spark 4 TIME type (flag-gated like FakeSource)
        DataType.fromDDL("time")
      case other => DataType.fromDDL(other)
    }
    case other => throw new IllegalArgumentException(s"bad zeta type: $other")
  }

  def structType(fields: Seq[(String, Any)]): StructType =
    StructType(fields.map { case (name, t) => StructField(name, dataTypeOf(t)) })

  /** The reference read-strategies' declared-schema semantics: the
    * physical columns CAST to the declared types (ReadStrategy convert
    * paths) rather than constrain the scan. String-typed physical columns
    * holding complex values (XML attributes, Excel cells) parse as JSON;
    * undeclared columns (Hive partition-dir fields) ride along appended.
    */
  def castTo(df: DataFrame, schema: StructType): DataFrame = {
    val current = df.schema.map(f => f.name -> f.dataType).toMap
    val declared = schema.fields.toSeq.map { f =>
      val c = col(f.name)
      f.dataType match {
        case dt if current.get(f.name).contains(dt) => c
        case dt @ (_: MapType | _: ArrayType | _: StructType)
            if current.get(f.name).contains(StringType) =>
          from_json(c, dt).as(f.name)
        // timestamp -> TIME keeps the time-of-day part (Spark has no
        // direct cast); try_cast everywhere else mirrors the reference
        // read-strategies' lenient convert (bad token -> null, not a
        // failed scan under ANSI)
        case dt: TimeType if current.get(f.name).exists(t =>
            t == TimestampType || t == TimestampNTZType) =>
          org.apache.spark.sql.functions.date_format(c, "HH:mm:ss")
            .cast(dt).as(f.name)
        case dt => c.try_cast(dt).as(f.name)
      }
    }
    val extras = df.columns.filterNot(schema.fieldNames.contains(_)).toSeq
    df.select(declared ++ extras.map(col): _*)
  }

  /** Pull a StructType out of a plugin's `schema` option, whichever form
    * it arrived in: nested HOCON `{fields {...}}` (insertion-ordered),
    * a plain map of fields, or a DDL string.
    */
  def fromSchemaOption(schema: Any): StructType = schema match {
    case m: scala.collection.Map[_, _] =>
      val mm = m.asInstanceOf[scala.collection.Map[String, Any]]
      // catalog-table metadata keys are not fields; a schema that only
      // names its table (self-describing formats) yields an empty struct
      val meta = Set("table", "primaryKey", "constraintKeys", "comment")
      (mm.get("fields"), mm.get("columns")) match {
        case (Some(fm: scala.collection.Map[_, _]), _) =>
          structType(fm.toSeq.map { case (k, v) => k.toString -> (v: Any) })
        case (_, Some(cols: Seq[_])) =>
          structType(cols.map(_.asInstanceOf[scala.collection.Map[String, Any]])
            .map(c => c("name").toString -> c("type")))
        case _ =>
          structType(mm.toSeq.collect {
            case (k, v) if !meta.contains(k.toString) => k.toString -> (v: Any) })
      }
    case s: String => DataType.fromDDL(s).asInstanceOf[StructType]
    case other => throw new IllegalArgumentException(s"bad schema option: $other")
  }
}
