package graft.sources

import java.sql.{DriverManager, ResultSet}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** CDC capture as a REAL DataSource V2 streaming source:
  * `spark.readStream.format("graft-cdc").option("url", …).option("table", …)
  * .option("pk", …).load()` — the reference's HybridSplitAssigner
  * (seatunnel-connectors-v2/connector-cdc/connector-cdc-base/src/main/java/
  * org/apache/seatunnel/connectors/cdc/base/source/enumerator/
  * HybridSplitAssigner.java) expressed through Spark's own streaming
  * engine instead of a hand-rolled assigner:
  *
  *  - The OFFSET is the changelog's totally-ordered CL_SEQ head; Spark's
  *    offset WAL gives exactly-once delivery of every changelog window
  *    across restarts for free.
  *  - The FIRST micro-batch (start offset -1) plans the snapshot chunk
  *    splits (`CdcCapture.planSplitsAuto` — the full skew/sparse/character
  *    key decision tree) as its input partitions, each an independent
  *    predicate-bounded JDBC read on an executor, PLUS the changelog
  *    window (0, head] — the hybrid handoff in one batch.
  *  - Every later batch is the changelog window (prevHead, head], chunked
  *    into `chunkSize` seq-ranges for parallelism.
  *
  * Rows carry the data columns + CL_SEQ (merge order; 0 for snapshot
  * rows) + `__row_kind` — directly consumable by
  * `StreamingOps.applyCdcStream`. Consistency contract: snapshot rows are
  * full-row images read at-or-after the low watermark, and every change
  * beyond the low watermark is replayed after them, so a last-change-wins
  * merge by (key, CL_SEQ) converges to the source state (the DBLog
  * argument; full-row images make interleaved in-window reconciliation
  * unnecessary — a chunk row can only be "too new", and the replayed
  * event that made it so re-asserts the same image). On a restart before
  * the first commit the snapshot is re-planned against the live table;
  * the same convergence argument applies.
  */
class CdcSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcMicroBatch.schemaFor(options.get("url"), options.get("table"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcV2Table(schema, properties)
}

private[sources] class CdcV2Table(tableSchema: StructType,
    props: util.Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-cdc:${props.get("table")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = throw new UnsupportedOperationException(
          "graft-cdc is a streaming source; use readStream")
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcMicroBatchStream(
            options.get("url"), options.get("table"), options.get("pk"),
            Option(options.get("chunkSize")).map(_.toLong).getOrElse(1000L),
            tableSchema)
      }
    }
}

private[sources] case class CdcOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

private[sources] sealed trait CdcPartition extends InputPartition
private[sources] case class SnapshotPartition(predicate: String) extends CdcPartition
private[sources] case class ChangelogPartition(loExcl: Long, hiIncl: Long) extends CdcPartition

private[sources] class CdcMicroBatchStream(url: String, table: String,
    pk: String, chunkSize: Long, schema: StructType) extends MicroBatchStream {
  require(url != null && table != null && pk != null,
    "graft-cdc: options url, table, pk are required")
  CdcCapture.installChangelog(url, table) // idempotent capture edge

  override def initialOffset(): Offset = CdcOffset(-1L)
  override def latestOffset(): Offset = CdcOffset(CdcCapture.maxSeq(url, table))
  override def deserializeOffset(json: String): Offset = CdcOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcOffset].seq
    val e = end.asInstanceOf[CdcOffset].seq
    def logWindows(lo: Long, hi: Long): Seq[ChangelogPartition] =
      (lo until hi by chunkSize).map(w => ChangelogPartition(w, math.min(w + chunkSize, hi)))
    if (s < 0) {
      val snaps = CdcCapture.planSplitsAuto(url, table, pk,
          CdcCapture.SplitterConfig(chunkSize = chunkSize))
        .map(sp => SnapshotPartition(sp.predicate(pk)))
      (snaps ++ logWindows(0L, math.max(e, 0L))).toArray
    } else logWindows(s, e).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(url, table, schema)
}

private[sources] class CdcReaderFactory(url: String, table: String,
    schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val dataCols = schema.fields.filterNot(f =>
      f.name == "CL_SEQ" || f.name == graft.operators.RowKindOps.RowKindCol)
    val colList = dataCols.map(_.name).mkString(", ")
    val (sql, constSeq, constKind) = partition match {
      case SnapshotPartition(pred) =>
        (s"SELECT $colList FROM $table WHERE $pred", Some(0L), Some("+I"))
      case ChangelogPartition(lo, hi) =>
        (s"SELECT $colList, CL_SEQ, CL_OP FROM ${CdcCapture.changelogTable(table)} " +
          s"WHERE CL_SEQ > $lo AND CL_SEQ <= $hi", None, None)
    }
    new CdcPartitionReader(url, sql, schema, dataCols, constSeq, constKind)
  }
}

/** One predicate/seq-window-bounded JDBC read on an executor. */
private[sources] class CdcPartitionReader(url: String, sql: String,
    schema: StructType, dataCols: Array[StructField],
    constSeq: Option[Long], constKind: Option[String])
  extends PartitionReader[InternalRow] {

  private val conn = DriverManager.getConnection(url)
  private val stmt = conn.createStatement()
  private val rs: ResultSet = stmt.executeQuery(sql)
  private val kindCol = graft.operators.RowKindOps.RowKindCol

  override def next(): Boolean = rs.next()

  override def get(): InternalRow = {
    val values = schema.fields.map { f =>
      f.name match {
        case "CL_SEQ" =>
          constSeq.getOrElse(rs.getLong("CL_SEQ")).asInstanceOf[Any]
        case n if n == kindCol =>
          UTF8String.fromString(
            constKind.getOrElse(rs.getString("CL_OP").trim))
        case n => readField(n, f.dataType)
      }
    }
    new GenericInternalRow(values)
  }

  private def readField(name: String, dt: DataType): Any = {
    val v: Any = dt match {
      case LongType => rs.getLong(name)
      case IntegerType => rs.getInt(name)
      case DoubleType => rs.getDouble(name)
      case BooleanType => rs.getBoolean(name)
      case StringType =>
        val s = rs.getString(name); if (s == null) null else UTF8String.fromString(s)
      case other => throw new IllegalArgumentException(
        s"graft-cdc: unsupported column type $other for $name")
    }
    if (rs.wasNull()) null else v
  }

  override def close(): Unit = {
    rs.close(); stmt.close(); conn.close()
  }
}

private[sources] object CdcMicroBatch {
  /** Source-table JDBC metadata -> stream schema: data columns + CL_SEQ +
    * row kind. Same supported-type contract as the partition reader.
    */
  def schemaFor(url: String, table: String): StructType = {
    require(url != null && table != null, "graft-cdc: options url and table are required")
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT * FROM $table WHERE 1=0")
        val md = rs.getMetaData
        import java.sql.Types._
        val dataFields = (1 to md.getColumnCount).map { i =>
          val dt = md.getColumnType(i) match {
            case BIGINT => LongType
            case INTEGER | SMALLINT => IntegerType
            case DOUBLE | FLOAT | REAL => DoubleType
            case BOOLEAN => BooleanType
            case VARCHAR | CHAR | LONGVARCHAR => StringType
            case t => throw new IllegalArgumentException(
              s"graft-cdc: unsupported column type $t for ${md.getColumnName(i)}")
          }
          StructField(md.getColumnName(i), dt)
        }
        rs.close()
        StructType(dataFields :+ StructField("CL_SEQ", LongType) :+
          StructField(graft.operators.RowKindOps.RowKindCol, StringType))
      } finally st.close()
    } finally conn.close()
  }
}
