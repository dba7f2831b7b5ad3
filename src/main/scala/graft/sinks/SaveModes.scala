package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Sink save-mode semantics (SURVEY §2.4).
  *
  * Mirrors the reference's two-axis model
  * (seatunnel-api/.../sink/SchemaSaveMode.java + DataSaveMode.java,
  * orchestrated by DefaultSaveModeHandler.java): the SCHEMA mode decides
  * what happens to the table/directory structure before the write, the
  * DATA mode decides what happens to existing rows. Handling runs once on
  * the driver before the (distributed) write, exactly like the reference's
  * SaveModeHandler.open/handle calls — the write itself is always an
  * append, because the handler has already produced the desired pre-state.
  */
object SaveModes {

  sealed abstract class SchemaSaveMode(val name: String)
  object SchemaSaveMode {
    /** Drop and re-create the structure (reference RECREATE_SCHEMA). */
    case object Recreate extends SchemaSaveMode("RECREATE_SCHEMA")
    /** Create only when absent (reference CREATE_SCHEMA_WHEN_NOT_EXIST). */
    case object CreateWhenNotExist extends SchemaSaveMode("CREATE_SCHEMA_WHEN_NOT_EXIST")
    /** Fail when absent (reference ERROR_WHEN_SCHEMA_NOT_EXIST). */
    case object ErrorWhenNotExist extends SchemaSaveMode("ERROR_WHEN_SCHEMA_NOT_EXIST")
    /** Leave structure handling to the writer (reference IGNORE). */
    case object Ignore extends SchemaSaveMode("IGNORE")

    val all: Seq[SchemaSaveMode] = Seq(Recreate, CreateWhenNotExist, ErrorWhenNotExist, Ignore)
    def parse(s: String): SchemaSaveMode = all.find(_.name.equalsIgnoreCase(s))
      .getOrElse(throw new IllegalArgumentException(s"unknown schema_save_mode: $s"))
  }

  sealed abstract class DataSaveMode(val name: String)
  object DataSaveMode {
    /** Keep structure, delete existing rows (reference DROP_DATA). */
    case object DropData extends DataSaveMode("DROP_DATA")
    /** Keep structure and rows (reference APPEND_DATA). */
    case object AppendData extends DataSaveMode("APPEND_DATA")
    /** Run user SQL before the write (reference CUSTOM_PROCESSING). */
    case object CustomProcessing extends DataSaveMode("CUSTOM_PROCESSING")
    /** Fail when rows already exist (reference ERROR_WHEN_DATA_EXISTS). */
    case object ErrorWhenDataExists extends DataSaveMode("ERROR_WHEN_DATA_EXISTS")

    val all: Seq[DataSaveMode] = Seq(DropData, AppendData, CustomProcessing, ErrorWhenDataExists)
    def parse(s: String): DataSaveMode = all.find(_.name.equalsIgnoreCase(s))
      .getOrElse(throw new IllegalArgumentException(s"unknown data_save_mode: $s"))
  }

  final class SaveModeException(msg: String) extends RuntimeException(msg)

  /** The catalog surface the handler drives — one implementation per sink
    * family (JDBC table, file directory). Mirrors the Catalog calls
    * DefaultSaveModeHandler makes.
    */
  trait Backend {
    def schemaExists(): Boolean
    def createSchema(): Unit
    def dropSchema(): Unit
    def dataExists(): Boolean
    def dropData(): Unit
    def custom(sql: String): Unit =
      throw new UnsupportedOperationException("this sink does not support CUSTOM_PROCESSING")
  }

  /** Apply both modes in reference order (schema first, then data). The
    * just-created-schema short circuit matches the reference's
    * isNewTableCreated flag: DROP_DATA against a table this call created
    * skips the pointless truncate.
    */
  def handle(schemaMode: SchemaSaveMode, dataMode: DataSaveMode, backend: Backend,
      customSql: Option[String] = None): Unit = {
    var newSchema = false
    schemaMode match {
      case SchemaSaveMode.Recreate =>
        if (backend.schemaExists()) backend.dropSchema()
        backend.createSchema()
        newSchema = true
      case SchemaSaveMode.CreateWhenNotExist =>
        if (!backend.schemaExists()) { backend.createSchema(); newSchema = true }
      case SchemaSaveMode.ErrorWhenNotExist =>
        if (!backend.schemaExists())
          throw new SaveModeException("sink schema does not exist (ERROR_WHEN_SCHEMA_NOT_EXIST)")
      case SchemaSaveMode.Ignore => ()
    }
    dataMode match {
      case DataSaveMode.DropData =>
        if (!newSchema && backend.schemaExists()) backend.dropData()
      case DataSaveMode.AppendData => ()
      case DataSaveMode.CustomProcessing =>
        backend.custom(customSql.getOrElse(
          throw new IllegalArgumentException("CUSTOM_PROCESSING requires custom_sql")))
      case DataSaveMode.ErrorWhenDataExists =>
        if (backend.dataExists())
          throw new SaveModeException("target already has data (ERROR_WHEN_DATA_EXISTS)")
    }
  }

  // ---------- JDBC backend ----------

  /** Generic ANSI-ish DDL from a Spark schema (tested against Derby; the
    * reference generates per-dialect DDL through its catalog SPI — Graft
    * keeps one conservative mapping).
    */
  private[graft] def sqlType(dt: DataType): String = dt match {
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case ShortType | ByteType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(4000)"
    case BinaryType => "BLOB"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${math.min(d.precision, 31)},${math.min(d.scale, 31)})"
    case other => throw new IllegalArgumentException(s"jdbc ddl: unsupported type $other")
  }

  private[sinks] def ddlFor(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      s""""${f.name}" ${sqlType(f.dataType)}${if (f.nullable) "" else " NOT NULL"}"""
    }
    s"""CREATE TABLE $table (${cols.mkString(", ")})"""
  }

  final class JdbcBackend(url: String, table: String, schema: StructType,
      props: java.util.Properties) extends Backend {

    private def withConn[A](f: java.sql.Connection => A): A = {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try f(conn) finally conn.close()
    }

    override def schemaExists(): Boolean = withConn { conn =>
      // unquoted identifiers are stored upper-case by Derby (and most
      // ANSI databases); check both spellings
      val md = conn.getMetaData
      def found(name: String) = {
        val rs = md.getTables(null, null, name, null)
        try rs.next() finally rs.close()
      }
      found(table) || found(table.toUpperCase)
    }

    override def createSchema(): Unit = withConn { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(ddlFor(table, schema)) finally st.close()
    }

    override def dropSchema(): Unit = withConn { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $table") finally st.close()
    }

    override def dataExists(): Boolean = withConn { conn =>
      val st = conn.createStatement()
      st.setMaxRows(1)
      try {
        val rs = st.executeQuery(s"SELECT 1 FROM $table")
        try rs.next() finally rs.close()
      } finally st.close()
    }

    override def dropData(): Unit = withConn { conn =>
      val st = conn.createStatement()
      // TRUNCATE where supported (constant-time), DELETE as the fallback
      try {
        try st.executeUpdate(s"TRUNCATE TABLE $table")
        catch { case _: java.sql.SQLException => st.executeUpdate(s"DELETE FROM $table") }
      } finally st.close()
    }

    override def custom(sql: String): Unit = withConn { conn =>
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    }
  }

  // ---------- file backend ----------

  /** For file sinks the directory is the "schema" and its files are the
    * "data" (the reference file sinks treat the path the same way).
    */
  final class FileBackend(df: DataFrame, path: String) extends Backend {
    private val p = new org.apache.hadoop.fs.Path(path)
    private def fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)

    private def dataFiles(): Array[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(p)) Array.empty
      else fs.listStatus(p).filterNot { s =>
        val n = s.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }

    override def schemaExists(): Boolean = fs.exists(p)
    override def createSchema(): Unit = fs.mkdirs(p)
    override def dropSchema(): Unit = fs.delete(p, true)
    override def dataExists(): Boolean = dataFiles().nonEmpty
    override def dropData(): Unit = dataFiles().foreach(s => fs.delete(s.getPath, true))
  }
}
