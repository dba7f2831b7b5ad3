package graft.formats

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Protobuf binary format, descriptor-driven like the reference
  * (seatunnel-formats/seatunnel-format-protobuf/.../ProtobufDeserializationSchema.java:32,
  * options `protobuf_schema` = .proto source text, `protobuf_message_name`).
  *
  * Neither `spark-protobuf` nor `protobuf-java` is on this classpath, so
  * both halves are implemented directly from the public spec:
  *  - a parser for the .proto message-definition subset (proto3 scalars,
  *    `repeated`/`optional`, nested + sibling messages);
  *  - the wire-format codec: varint, zigzag (sint), fixed32/64,
  *    length-delimited, packed + unpacked repeated primitives, unknown
  *    fields skipped by wire type.
  *
  * Scale: encode/decode run as typed `Dataset.map` per partition — a
  * narrow, shuffle-free stage; the parsed descriptor is a small
  * serializable value captured in the closure (no per-row parsing).
  */
object ProtobufFormat {

  // ---------- descriptor model (serializable, closure-friendly) ----------

  sealed trait PType extends Serializable
  case object PInt32 extends PType    // varint, also enum carriers
  case object PInt64 extends PType
  case object PUInt32 extends PType   // decoded widened to Long
  case object PUInt64 extends PType
  case object PSInt32 extends PType   // zigzag
  case object PSInt64 extends PType
  case object PBool extends PType
  case object PString extends PType
  case object PBytes extends PType
  case object PFloat extends PType
  case object PDouble extends PType
  case object PFixed32 extends PType  // unsigned, widened to Long
  case object PFixed64 extends PType
  case object PSFixed32 extends PType
  case object PSFixed64 extends PType
  final case class PMessageRef(name: String) extends PType

  final case class PField(name: String, number: Int, typ: PType, repeated: Boolean)
  final case class PMessage(name: String, fields: Seq[PField])
  final case class PSchema(messages: Map[String, PMessage]) extends Serializable {
    def message(name: String): PMessage =
      messages.getOrElse(name,
        throw new IllegalArgumentException(
          s"protobuf: unknown message '$name' (have: ${messages.keys.mkString(", ")})"))
  }

  private val scalarTypes: Map[String, PType] = Map(
    "int32" -> PInt32, "int64" -> PInt64, "uint32" -> PUInt32, "uint64" -> PUInt64,
    "sint32" -> PSInt32, "sint64" -> PSInt64, "bool" -> PBool, "string" -> PString,
    "bytes" -> PBytes, "float" -> PFloat, "double" -> PDouble,
    "fixed32" -> PFixed32, "fixed64" -> PFixed64,
    "sfixed32" -> PSFixed32, "sfixed64" -> PSFixed64)

  // ---------- .proto text parser (message-definition subset) ----------

  /** Parse .proto source text. Supported: `syntax`/`package`/`option`
    * headers (ignored), `message` blocks with scalar fields, `repeated`/
    * `optional` labels, nested and sibling message types. Unsupported
    * constructs (enum, oneof, map<>, imports, extensions) raise with a
    * clear message.
    */
  def parseSchema(proto: String): PSchema = {
    val tokens = tokenize(proto)
    val out = mutable.Map[String, PMessage]()
    val it = tokens.iterator.buffered
    def expect(t: String): Unit = {
      val got = it.next(); require(got == t, s"protobuf parse: expected '$t', got '$got'")
    }
    def parseMessage(prefix: String): Unit = {
      expect("message")
      val name = it.next()
      val full = if (prefix.isEmpty) name else s"$prefix.$name"
      expect("{")
      val fields = mutable.Buffer[PField]()
      while (it.head != "}") {
        it.head match {
          case "message" => parseMessage(full)
          case "enum" | "oneof" | "map" | "extend" | "import" | "reserved" =>
            throw new IllegalArgumentException(
              s"protobuf parse: '${it.head}' not supported in this subset")
          case "option" => while (it.next() != ";") {}
          case _ =>
            val repeated = it.head == "repeated"
            if (it.head == "repeated" || it.head == "optional" || it.head == "required") it.next()
            val tname = it.next()
            val fname = it.next()
            expect("=")
            val number = it.next().toInt
            // skip field options like [deprecated = true]
            if (it.head == "[") { while (it.next() != "]") {} }
            expect(";")
            val typ = scalarTypes.getOrElse(tname,
              PMessageRef(if (out.contains(s"$full.$tname")) s"$full.$tname" else tname))
            fields += PField(fname, number, typ, repeated)
        }
      }
      expect("}")
      out(full) = PMessage(full, fields.toSeq)
      if (prefix.isEmpty) out(name) = out(full) // top-level short name alias
    }
    while (it.hasNext) {
      it.head match {
        case "syntax" | "package" | "option" => while (it.hasNext && it.next() != ";") {}
        case "message" => parseMessage("")
        case other => throw new IllegalArgumentException(s"protobuf parse: unexpected '$other'")
      }
    }
    PSchema(out.toMap)
  }

  private def tokenize(s: String): Vector[String] = {
    val noComments = s.replaceAll("//[^\n]*", " ").replaceAll("/\\*.*?\\*/", " ")
    val buf = mutable.Buffer[String]()
    val m = java.util.regex.Pattern
      .compile("""[A-Za-z0-9_.\"\-]+|[{}=;\[\]]""").matcher(noComments)
    while (m.find()) buf += m.group()
    buf.toVector
  }

  // ---------- Spark schema mapping ----------

  def toSparkSchema(schema: PSchema, messageName: String): StructType = {
    val msg = schema.message(messageName)
    StructType(msg.fields.map { f =>
      val base = f.typ match {
        case PInt32 | PSInt32 | PSFixed32 => IntegerType
        case PInt64 | PSInt64 | PSFixed64 | PUInt32 | PUInt64 | PFixed32 | PFixed64 => LongType
        case PBool => BooleanType
        case PString => StringType
        case PBytes => BinaryType
        case PFloat => FloatType
        case PDouble => DoubleType
        case PMessageRef(n) => toSparkSchema(schema, n)
      }
      StructField(f.name, if (f.repeated) ArrayType(base) else base)
    })
  }

  // ---------- wire format: encode ----------

  private def wireType(t: PType): Int = t match {
    case PFloat | PFixed32 | PSFixed32 => 5
    case PDouble | PFixed64 | PSFixed64 => 1
    case PString | PBytes | _: PMessageRef => 2
    case _ => 0
  }

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(field: Int, wt: Int): Unit = varint((field.toLong << 3) | wt)
    def fixed32(v: Int): Unit = { var i = 0; while (i < 4) { out.write((v >>> (8 * i)) & 0xff); i += 1 } }
    def fixed64(v: Long): Unit = { var i = 0; while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
    def bytesField(b: Array[Byte]): Unit = { varint(b.length); out.write(b) }
  }

  private def zigzag32(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
  private def zigzag64(v: Long): Long = (v << 1) ^ (v >> 63)

  def encodeRow(row: Row, msg: PMessage, schema: PSchema): Array[Byte] = {
    val w = new Writer
    var i = 0
    while (i < msg.fields.length) {
      val f = msg.fields(i)
      val v = if (i < row.length) row.get(i) else null
      if (v != null) {
        if (f.repeated) v.asInstanceOf[scala.collection.Seq[Any]]
          .foreach(x => if (x != null) writeOne(w, f, x, schema))
        else writeOne(w, f, v, schema)
      }
      i += 1
    }
    w.bytes
  }

  private def writeOne(w: Writer, f: PField, v: Any, schema: PSchema): Unit = {
    w.tag(f.number, wireType(f.typ))
    f.typ match {
      case PInt32 => w.varint(v.asInstanceOf[Int].toLong)
      case PInt64 => w.varint(v.asInstanceOf[Long])
      case PUInt32 | PUInt64 => w.varint(anyToLong(v))
      case PSInt32 => w.varint(zigzag32(v.asInstanceOf[Int]))
      case PSInt64 => w.varint(zigzag64(v.asInstanceOf[Long]))
      case PBool => w.varint(if (v.asInstanceOf[Boolean]) 1 else 0)
      case PString => w.bytesField(v.asInstanceOf[String].getBytes("UTF-8"))
      case PBytes => w.bytesField(v.asInstanceOf[Array[Byte]])
      case PFloat => w.fixed32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
      case PDouble => w.fixed64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case PFixed32 => w.fixed32(anyToLong(v).toInt)
      case PSFixed32 => w.fixed32(v.asInstanceOf[Int])
      case PFixed64 => w.fixed64(anyToLong(v))
      case PSFixed64 => w.fixed64(v.asInstanceOf[Long])
      case PMessageRef(n) =>
        w.bytesField(encodeRow(v.asInstanceOf[Row], schema.message(n), schema))
    }
  }

  private def anyToLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case other => other.asInstanceOf[Number].longValue()
  }

  // ---------- wire format: decode ----------

  private final class Reader(buf: Array[Byte], start: Int, end: Int) {
    var pos: Int = start
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      out
    }
    def fixed32(): Int = {
      var v = 0; var i = 0
      while (i < 4) { v |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; v
    }
    def fixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def lengthDelimited(): (Int, Int) = {
      val len = varint().toInt; val s = pos; pos += len; (s, s + len)
    }
    def skip(wt: Int): Unit = wt match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val len = varint().toInt; pos += len
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"protobuf: cannot skip wire type $other")
    }
  }

  def decodeBytes(bytes: Array[Byte], msg: PMessage, schema: PSchema): Row =
    decodeRange(bytes, 0, bytes.length, msg, schema)

  private def decodeRange(buf: Array[Byte], start: Int, end: Int,
      msg: PMessage, schema: PSchema): Row = {
    val byNumber = msg.fields.map(f => f.number -> f).toMap
    val idx = msg.fields.zipWithIndex.map { case (f, i) => f.number -> i }.toMap
    val values = new Array[Any](msg.fields.length)
    val lists = mutable.Map[Int, mutable.Buffer[Any]]()
    val r = new Reader(buf, start, end)
    while (r.hasMore) {
      val key = r.varint()
      val num = (key >>> 3).toInt
      val wt = (key & 7).toInt
      byNumber.get(num) match {
        case None => r.skip(wt)
        case Some(f) =>
          def put(v: Any): Unit =
            if (f.repeated) lists.getOrElseUpdate(num, mutable.Buffer()) += v
            else values(idx(num)) = v
          if (f.repeated && wt == 2 && wireType(f.typ) != 2) {
            // packed repeated primitives
            val (s, e) = r.lengthDelimited()
            val pr = new Reader(buf, s, e)
            while (pr.hasMore) put(readScalar(pr, f.typ, schema, buf))
          } else {
            f.typ match {
              case PMessageRef(n) =>
                val (s, e) = r.lengthDelimited()
                put(decodeRange(buf, s, e, schema.message(n), schema))
              case PString =>
                val (s, e) = r.lengthDelimited()
                put(new String(buf, s, e - s, "UTF-8"))
              case PBytes =>
                val (s, e) = r.lengthDelimited()
                put(java.util.Arrays.copyOfRange(buf, s, e))
              case t => put(readScalar(r, t, schema, buf))
            }
          }
      }
    }
    for ((num, l) <- lists) values(idx(num)) = l.toSeq
    Row.fromSeq(values.toIndexedSeq)
  }

  private def readScalar(r: Reader, t: PType, schema: PSchema, buf: Array[Byte]): Any = t match {
    case PInt32 => r.varint().toInt
    case PInt64 => r.varint()
    case PUInt32 => r.varint() & 0xffffffffL
    case PUInt64 => r.varint()
    case PSInt32 => { val z = r.varint(); ((z >>> 1) ^ -(z & 1)).toInt }
    case PSInt64 => { val z = r.varint(); (z >>> 1) ^ -(z & 1) }
    case PBool => r.varint() != 0
    case PFloat => java.lang.Float.intBitsToFloat(r.fixed32())
    case PDouble => java.lang.Double.longBitsToDouble(r.fixed64())
    case PFixed32 => r.fixed32().toLong & 0xffffffffL
    case PSFixed32 => r.fixed32()
    case PFixed64 => r.fixed64()
    case PSFixed64 => r.fixed64()
    case other => throw new IllegalArgumentException(s"protobuf: $other is not a scalar")
  }

  // ---------- DataFrame surface ----------

  /** Decode `binaryCol` into a struct column `outputCol` (schema derived
    * from the .proto text + message name, like the reference options).
    */
  def decode(df: DataFrame, binaryCol: String, protoText: String,
      messageName: String, outputCol: String = "value"): DataFrame = {
    val schema = parseSchema(protoText)
    val msg = schema.message(messageName)
    val structType = toSparkSchema(schema, messageName)
    val outSchema = StructType(df.schema.fields :+ StructField(outputCol, structType))
    val binIdx = df.schema.fieldIndex(binaryCol)
    df.map { row =>
      val bytes = row.getAs[Array[Byte]](binIdx)
      val decoded = if (bytes == null) null else decodeBytes(bytes, msg, schema)
      Row.fromSeq(row.toSeq :+ decoded)
    }(Encoders.row(outSchema))
  }

  /** Encode the struct column `structCol` (or, with None, all columns) as
    * protobuf binary in `outputCol`.
    */
  def encode(df: DataFrame, structCol: Option[String], protoText: String,
      messageName: String, outputCol: String = "proto"): DataFrame = {
    val schema = parseSchema(protoText)
    val msg = schema.message(messageName)
    val src = structCol match {
      case Some(c) => df
      case None => df.select(struct(df.columns.map(col).toIndexedSeq: _*).as("__all"))
    }
    val colName = structCol.getOrElse("__all")
    val idx = src.schema.fieldIndex(colName)
    val outSchema = StructType(src.schema.fields :+ StructField(outputCol, BinaryType))
    val out = src.map { row =>
      val s = row.getAs[Row](idx)
      val bytes = if (s == null) null else encodeRow(s, msg, schema)
      Row.fromSeq(row.toSeq :+ bytes)
    }(Encoders.row(outSchema))
    if (structCol.isEmpty) out.select(col(outputCol)) else out
  }
}
