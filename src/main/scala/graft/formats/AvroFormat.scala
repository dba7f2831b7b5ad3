package graft.formats

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord, GenericRecordBuilder}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file format: distributed read/write over the Avro Java
  * API + Hadoop `AvroKey{Input,Output}Format` (the `spark-avro` module is
  * not on this classpath, so the format is implemented directly — same
  * wire format, readable by any Avro tooling).
  *
  * Scale notes: Avro container files are splittable on sync markers, so
  * the read parallelizes like any Hadoop input (one task per split);
  * writes go through `saveAsNewAPIHadoopFile` (one file per partition, no
  * driver funnel). Schema mapping follows the common Spark convention —
  * nullable fields are `union(null, T)`, timestamps are
  * `timestamp-micros`, dates are the `date` logical type, decimals are
  * `bytes` + `decimal` — matching the reference's Avro semantics
  * (seatunnel-formats/seatunnel-format-avro/.../AvroDeserializationSchema.java:35,
  * AvroSerializationSchema / SeaTunnelRowTypeToAvroSchemaConverter).
  */
object AvroFormat {

  // ---------- schema: StructType -> Avro ----------

  def toAvroSchema(st: StructType, recordName: String = "graft_record",
      namespace: String = "graft.avro"): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType, f.nullable, s"${recordName}_${f.name}"),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, namespace, false, fields.toList.asJava)
  }

  private def fieldSchema(dt: DataType, nullable: Boolean, name: String): Schema = {
    val base = dt match {
      case StringType => Schema.create(Schema.Type.STRING)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, containsNull) =>
        Schema.createArray(fieldSchema(et, containsNull, s"${name}_item"))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(fieldSchema(vt, valueContainsNull, s"${name}_value"))
      case st: StructType => toAvroSchema(st, name)
      case other => throw new IllegalArgumentException(s"avro: unsupported Spark type $other")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  // ---------- schema: Avro -> StructType ----------

  def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"avro: top-level schema must be a record, got $schema")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = sparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toArray)
  }

  private def sparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"avro: only union(null, T) supported, got $s")
      (sparkType(nonNull.head)._1, true)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis => (TimestampType, false)
        case _: LogicalTypes.LocalTimestampMicros | _: LogicalTypes.LocalTimestampMillis =>
          (TimestampNTZType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (et, n) = sparkType(s.getElementType)
      (ArrayType(et, n), false)
    case Schema.Type.MAP =>
      val (vt, n) = sparkType(s.getValueType)
      (MapType(StringType, vt, n), false)
    case Schema.Type.RECORD => (toSparkSchema(s), false)
    case other => throw new IllegalArgumentException(s"avro: unsupported Avro type $other")
  }

  // ---------- value conversion ----------

  private def toAvroValue(v: Any, s: Schema): Any = {
    if (v == null) return null
    val target = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s
    (v, target.getType) match {
      case (ts: java.sql.Timestamp, Schema.Type.LONG) =>
        ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
      case (ldt: java.time.LocalDateTime, Schema.Type.LONG) =>
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000
      case (d: java.sql.Date, Schema.Type.INT) => d.toLocalDate.toEpochDay.toInt
      case (d: java.math.BigDecimal, Schema.Type.BYTES) =>
        val lt = target.getLogicalType.asInstanceOf[LogicalTypes.Decimal]
        java.nio.ByteBuffer.wrap(d.setScale(lt.getScale).unscaledValue().toByteArray)
      case (b: Array[Byte], Schema.Type.BYTES) => java.nio.ByteBuffer.wrap(b)
      case (seq: scala.collection.Seq[_], Schema.Type.ARRAY) =>
        seq.map(x => toAvroValue(x, target.getElementType)).asJava
      case (m: scala.collection.Map[_, _], Schema.Type.MAP) =>
        m.map { case (k, x) =>
          k.toString -> toAvroValue(x, target.getValueType)
        }.toMap.asJava
      case (r: Row, Schema.Type.RECORD) => rowToRecord(r, target)
      case (n: java.lang.Short, Schema.Type.INT) => n.intValue()
      case (n: java.lang.Byte, Schema.Type.INT) => n.intValue()
      case (x, _) => x
    }
  }

  private def rowToRecord(row: Row, schema: Schema): GenericRecord = {
    val b = new GenericRecordBuilder(schema)
    val fields = schema.getFields.asScala
    var i = 0
    while (i < fields.length) {
      b.set(fields(i), toAvroValue(row.get(i), fields(i).schema()))
      i += 1
    }
    b.build()
  }

  /** Unwrap union(null, T) to T; null-safe (schema may be absent when a
    * user-supplied Spark schema names a field the file lacks).
    */
  private def unwrapNull(s: Schema): Schema =
    if (s != null && s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  /** Convert one Avro value. The Avro field schema rides along so logical
    * types disambiguate the wire encoding — in particular
    * timestamp-millis/local-timestamp-millis longs (common in files from
    * other tooling) scale to micros instead of being read 1000x too small.
    */
  private def fromAvroValue(v: Any, dt: DataType, avro: Schema): Any = {
    if (v == null) return null
    val s = unwrapNull(avro)
    def logical = if (s == null) null else s.getLogicalType
    (v, dt) match {
      case (u: CharSequence, StringType) => u.toString
      case (l: java.lang.Long, TimestampType) =>
        val micros =
          if (logical.isInstanceOf[LogicalTypes.TimestampMillis]) l * 1000L else l.longValue()
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case (l: java.lang.Long, TimestampNTZType) =>
        val micros =
          if (logical.isInstanceOf[LogicalTypes.LocalTimestampMillis]) l * 1000L else l.longValue()
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case (i: java.lang.Integer, DateType) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
      case (bb: java.nio.ByteBuffer, d: DecimalType) =>
        val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case (bb: java.nio.ByteBuffer, BinaryType) =>
        val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
        bytes
      case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes().clone()
      case (l: java.util.List[_], ArrayType(et, _)) =>
        val elem = if (s != null && s.getType == Schema.Type.ARRAY) s.getElementType else null
        l.asScala.map(x => fromAvroValue(x, et, elem)).toSeq
      case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
        val value = if (s != null && s.getType == Schema.Type.MAP) s.getValueType else null
        m.asScala.map { case (k, x) => k.toString -> fromAvroValue(x, vt, value) }.toMap
      case (r: GenericRecord, st: StructType) => recordToRow(r, st)
      case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
      case (x, _) => x
    }
  }

  private def recordToRow(rec: GenericRecord, st: StructType): Row = {
    val vals = new Array[Any](st.fields.length)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      val avroField = rec.getSchema.getField(f.name)
      val raw = if (avroField != null) rec.get(f.name) else null
      vals(i) = fromAvroValue(raw, f.dataType, if (avroField != null) avroField.schema() else null)
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  // ---------- read / write ----------

  /** Read an Avro directory/file into a DataFrame. The schema is taken
    * from `userSchema` or sniffed from the first container file's header
    * (one driver-side open — the data itself is read distributed).
    */
  def read(spark: SparkSession, path: String, userSchema: Option[StructType] = None): DataFrame = {
    val avroSchema = sniffSchema(spark, path)
    val sparkSchema = userSchema.getOrElse(toSparkSchema(avroSchema))
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable])
      .map { case (k, _) => recordToRow(k.datum(), sparkSchema) }
    spark.createDataFrame(rdd, sparkSchema)
  }

  private def sniffSchema(spark: SparkSession, path: String): Schema = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isFile) p
      else fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
        .sortBy(_.getPath.getName).headOption
        .map(_.getPath)
        .getOrElse(throw new IllegalArgumentException(s"avro: no .avro files under $path"))
    val in = new org.apache.avro.mapred.FsInput(file, conf)
    val reader = new org.apache.avro.file.DataFileReader(in,
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    try reader.getSchema finally reader.close()
  }

  /** Write a DataFrame as Avro container files, one per partition.
    * `compression`: none | deflate | snappy (snappy-java is on the Spark
    * classpath).
    */
  def write(df: DataFrame, path: String, compression: String = "snappy"): Unit = {
    val sparkSchema = df.schema
    val avroSchema = toAvroSchema(sparkSchema)
    val schemaJson = avroSchema.toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    job.getConfiguration.set("avro.output.codec",
      if (compression == "none") "null" else compression)
    df.rdd.mapPartitions { it =>
      // parse once per partition; Schema isn't serializable
      val schema = new Schema.Parser().parse(schemaJson)
      it.map(row => (new AvroKey[GenericRecord](rowToRecord(row, schema)), NullWritable.get()))
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }
}
