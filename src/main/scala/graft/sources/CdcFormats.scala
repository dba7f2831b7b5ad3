package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import graft.operators.RowKindOps

/** CDC envelope parsers: debezium-json, canal-json, maxwell-json.
  *
  * References:
  *  - seatunnel-formats/seatunnel-format-compatible-debezium-json
  *  - seatunnel-formats/seatunnel-format-json (canal / maxwell / ogg)
  *
  * Each parser turns a column of raw envelope JSON into typed change rows
  * tagged with `__row_kind` (+I/-U/+U/-D, the RowKindOps convention): one
  * `from_json` pass per envelope, then a row explosion for the
  * before/after images of updates. Everything is columnar/codegen — no
  * per-row JSON library dispatch like the row-at-a-time reference path.
  */
object CdcFormats {

  private def payload(dataSchema: StructType): Column => Column = c => from_json(c, dataSchema)

  /** Debezium: {before, after, op: c|r|u|d, source:{db,table}, ts_ms}.
    * op c/r -> +I(after); u -> -U(before) and +U(after); d -> -D(before).
    */
  def parseDebezium(df: DataFrame, jsonCol: String, dataSchema: StructType): DataFrame = {
    val envSchema = new StructType()
      .add("before", dataSchema).add("after", dataSchema)
      .add("op", StringType)
    val parsed = df.withColumn("__env", from_json(col(jsonCol), envSchema))
    val images = parsed.select(col("__env"),
      explode(filter(array(
        struct(col("__env.before").as("row"),
          when(col("__env.op") === "u", "-U").when(col("__env.op") === "d", "-D").as("kind")),
        struct(col("__env.after").as("row"),
          when(col("__env.op").isin("c", "r"), "+I").when(col("__env.op") === "u", "+U").as("kind"))
      ), x => x.getField("kind").isNotNull && x.getField("row").isNotNull)).as("img"))
    images.select(col(s"img.row.*"), col("img.kind").as(RowKindOps.RowKindCol))
  }

  /** Canal: {data:[...], old:[...], type: INSERT|UPDATE|DELETE, ...}.
    * INSERT -> +I(data[i]); DELETE -> -D(data[i]);
    * UPDATE -> -U(data[i] patched with old[i]) and +U(data[i]).
    */
  def parseCanal(df: DataFrame, jsonCol: String, dataSchema: StructType): DataFrame = {
    val envSchema = new StructType()
      .add("data", org.apache.spark.sql.types.ArrayType(dataSchema))
      .add("old", org.apache.spark.sql.types.ArrayType(dataSchema))
      .add("type", StringType)
    val parsed = df.withColumn("__env", from_json(col(jsonCol), envSchema))
      .select(col("__env.type").as("__t"),
        posexplode(col("__env.data")).as(Seq("__i", "__row")),
        col("__env.old").as("__old"))
    // canal's `old` holds only changed fields of the pre-image; a full
    // pre-image reconstruction needs per-field coalesce(old[i].f, row.f).
    val beforeRow = {
      val o = col("__old").getItem(col("__i"))
      struct(dataSchema.fieldNames.map(f =>
        coalesce(o.getField(f), col(s"__row.$f")).as(f)): _*)
    }
    val images = parsed.select(explode(filter(array(
      struct(when(col("__t") === "UPDATE", beforeRow).otherwise(col("__row")).as("row"),
        when(col("__t") === "UPDATE", "-U").when(col("__t") === "DELETE", "-D").as("kind")),
      struct(col("__row").as("row"),
        when(col("__t") === "INSERT", "+I").when(col("__t") === "UPDATE", "+U").as("kind"))
    ), x => x.getField("kind").isNotNull)).as("img"))
    images.select(col("img.row.*"), col("img.kind").as(RowKindOps.RowKindCol))
  }

  /** Oracle GoldenGate (ogg-json): {before, after, op_type: I|U|D, table,
    * op_ts}. I -> +I(after); U -> -U(before) and +U(after); D -> -D(before).
    */
  def parseOgg(df: DataFrame, jsonCol: String, dataSchema: StructType): DataFrame = {
    val envSchema = new StructType()
      .add("before", dataSchema).add("after", dataSchema)
      .add("op_type", StringType)
    val parsed = df.withColumn("__env", from_json(col(jsonCol), envSchema))
    val images = parsed.select(col("__env"),
      explode(filter(array(
        struct(col("__env.before").as("row"),
          when(col("__env.op_type") === "U", "-U")
            .when(col("__env.op_type") === "D", "-D").as("kind")),
        struct(col("__env.after").as("row"),
          when(col("__env.op_type") === "I", "+I")
            .when(col("__env.op_type") === "U", "+U").as("kind"))
      ), x => x.getField("kind").isNotNull && x.getField("row").isNotNull)).as("img"))
    images.select(col("img.row.*"), col("img.kind").as(RowKindOps.RowKindCol))
  }

  /** Kafka Connect JSON envelope ({"schema": ..., "payload": row-or-rows})
    * — reference seatunnel-format-compatible-connect-json/.../
    * CompatibleKafkaConnectDeserializationSchema.java:117. The payload may
    * be a single object or an array; both become +I rows. A Debezium
    * payload nested in a Connect envelope should be unwrapped with this
    * and then fed to [[parseDebezium]].
    */
  def parseConnectJson(df: DataFrame, jsonCol: String, dataSchema: StructType): DataFrame = {
    val envSchema = new StructType()
      .add("payload", org.apache.spark.sql.types.ArrayType(dataSchema))
    val envSchemaSingle = new StructType().add("payload", dataSchema)
    // try array form first; fall back to single-object payload per row
    val parsed = df.select(
      from_json(col(jsonCol), envSchema).getField("payload").as("__rows"),
      from_json(col(jsonCol), envSchemaSingle).getField("payload").as("__row"))
    parsed
      .select(explode(when(col("__rows").isNotNull, col("__rows"))
        .otherwise(array(col("__row")))).as("__r"))
      .where(col("__r").isNotNull)
      .select(col("__r.*"))
      .withColumn(RowKindOps.RowKindCol, lit("+I"))
  }

  // ---------- serialization (write side) ----------
  //
  // The reference formats are bidirectional; kind mapping follows the
  // serializers (seatunnel-format-json/.../canal/CanalJsonSerializationSchema
  // .java:63, debezium/DebeziumJsonSerializationSchema.java:47,
  // maxwell/MaxWellJsonSerializationSchema.java:52): INSERT/UPDATE_AFTER
  // emit the insert op with the row image, UPDATE_BEFORE/DELETE emit the
  // delete op. All are single to_json projections — codegen'd, narrow.

  private def dataStruct(df: DataFrame, dataCols: Seq[String]): Column = {
    val cols = if (dataCols.nonEmpty) dataCols
               else df.columns.filterNot(_ == RowKindOps.RowKindCol).toSeq
    struct(cols.map(col): _*)
  }

  /** Debezium envelope: +I/+U -> {"after": row, "op": "c"};
    * -U/-D -> {"before": row, "op": "d"}.
    */
  def toDebeziumJson(df: DataFrame, dataCols: Seq[String] = Nil,
      outputCol: String = "json"): DataFrame = {
    val data = dataStruct(df, dataCols)
    val ins = col(RowKindOps.RowKindCol).isin("+I", "+U")
    df.select(to_json(struct(
      when(!ins, data).as("before"),
      when(ins, data).as("after"),
      when(ins, "c").otherwise("d").as("op"))).as(outputCol))
  }

  /** Canal envelope: +I/+U -> {"data":[row],"type":"INSERT"};
    * -U/-D -> {"data":[row],"type":"DELETE"}.
    */
  def toCanalJson(df: DataFrame, dataCols: Seq[String] = Nil,
      outputCol: String = "json"): DataFrame = {
    val data = dataStruct(df, dataCols)
    val ins = col(RowKindOps.RowKindCol).isin("+I", "+U")
    df.select(to_json(struct(
      array(data).as("data"),
      when(ins, "INSERT").otherwise("DELETE").as("type"))).as(outputCol))
  }

  /** Maxwell envelope: +I/+U -> {"data": row, "type": "insert"};
    * -U/-D -> {"data": row, "type": "delete"} (lowercase op strings, the
    * format Maxwell itself emits and `parseMaxwell` accepts).
    */
  def toMaxwellJson(df: DataFrame, dataCols: Seq[String] = Nil,
      outputCol: String = "json"): DataFrame = {
    val data = dataStruct(df, dataCols)
    val ins = col(RowKindOps.RowKindCol).isin("+I", "+U")
    df.select(to_json(struct(
      data.as("data"),
      when(ins, "insert").otherwise("delete").as("type"))).as(outputCol))
  }

  /** GoldenGate ogg-json envelope, symmetric with [[parseOgg]]:
    * +I/+U -> {"after": row, "op_type": "I"}; -U/-D -> {"before": row,
    * "op_type": "D"}. Kind mapping follows the reference serializer
    * (seatunnel-format-json/.../ogg/OggJsonSerializationSchema.java:61 —
    * INSERT/UPDATE_AFTER emit the insert op, UPDATE_BEFORE/DELETE the
    * delete op); the envelope field names follow the GoldenGate wire shape
    * the parse side accepts, so toOggJson -> parseOgg round-trips.
    */
  def toOggJson(df: DataFrame, dataCols: Seq[String] = Nil,
      outputCol: String = "json"): DataFrame = {
    val data = dataStruct(df, dataCols)
    val ins = col(RowKindOps.RowKindCol).isin("+I", "+U")
    df.select(to_json(struct(
      when(!ins, data).as("before"),
      when(ins, data).as("after"),
      when(ins, "I").otherwise("D").as("op_type"))).as(outputCol))
  }

  /** Maxwell: {data, old, type: insert|update|delete, ...}. Single-row
    * envelopes; update pre-image = data patched with old's changed fields.
    */
  def parseMaxwell(df: DataFrame, jsonCol: String, dataSchema: StructType): DataFrame = {
    val envSchema = new StructType()
      .add("data", dataSchema).add("old", dataSchema).add("type", StringType)
    val parsed = df.withColumn("__env", from_json(col(jsonCol), envSchema))
      .select(col("__env.type").as("__t"), col("__env.data").as("__row"), col("__env.old").as("__old"))
    val beforeRow = struct(dataSchema.fieldNames.map(f =>
      coalesce(col(s"__old.$f"), col(s"__row.$f")).as(f)): _*)
    val images = parsed.select(explode(filter(array(
      struct(when(col("__t") === "update", beforeRow).otherwise(col("__row")).as("row"),
        when(col("__t") === "update", "-U").when(col("__t") === "delete", "-D").as("kind")),
      struct(col("__row").as("row"),
        when(col("__t") === "insert", "+I").when(col("__t") === "update", "+U").as("kind"))
    ), x => x.getField("kind").isNotNull && x.getField("row").isNotNull)).as("img"))
    images.select(col("img.row.*"), col("img.kind").as(RowKindOps.RowKindCol))
  }
}
