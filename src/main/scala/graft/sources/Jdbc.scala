package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink (SURVEY §2.4).
  *
  * Reference: seatunnel-connectors-v2/connector-jdbc (JdbcSourceConfig:
  * url/driver/user/password/query or table, partition_column +
  * partition_num + bounds; JdbcSinkConfig: batch_size, generate_sink_sql).
  *
  * Scale design: a single-connection JDBC pull is a driver-side funnel;
  * the 100 TB-relevant path is the PARTITIONED read — `partitionColumn`
  * with bounds fans the scan out to `numPartitions` parallel range
  * queries, one per task. Predicates still push into the database
  * (`PushedFilters` on the JDBC scan). Tested against the embedded Derby
  * that ships on the Spark classpath.
  */
object Jdbc {

  final case class JdbcSourceConfig(
      url: String,
      table: Option[String] = None,
      query: Option[String] = None,
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None,
      partitionColumn: Option[String] = None,
      numPartitions: Option[Int] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      fetchSize: Option[Int] = None,
      options: Map[String, String] = Map.empty) {
    require(table.isDefined != query.isDefined,
      "jdbc source: exactly one of table/query is required")
  }

  def read(spark: SparkSession, cfg: JdbcSourceConfig): DataFrame = {
    var r = spark.read.format("jdbc").option("url", cfg.url)
    cfg.table.foreach(t => r = r.option("dbtable", t))
    cfg.query.foreach(q => r = r.option("query", q))
    cfg.user.foreach(u => r = r.option("user", u))
    cfg.password.foreach(p => r = r.option("password", p))
    cfg.driver.foreach(d => r = r.option("driver", d))
    cfg.fetchSize.foreach(n => r = r.option("fetchsize", n.toString))
    (cfg.partitionColumn, cfg.numPartitions) match {
      case (Some(colName), Some(n)) =>
        require(cfg.query.isEmpty, "jdbc source: partitioned read requires table, not query")
        val lo = cfg.lowerBound.getOrElse(
          throw new IllegalArgumentException("jdbc source: partitionColumn needs lowerBound"))
        val hi = cfg.upperBound.getOrElse(
          throw new IllegalArgumentException("jdbc source: partitionColumn needs upperBound"))
        r = r.option("partitionColumn", colName)
          .option("numPartitions", n.toString)
          .option("lowerBound", lo.toString)
          .option("upperBound", hi.toString)
      case (None, _) =>
      case _ => throw new IllegalArgumentException(
        "jdbc source: partitionColumn and numPartitions go together")
    }
    r.options(cfg.options).load()
  }

  final case class JdbcSinkConfig(
      url: String,
      table: String,
      mode: String = "append",
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None,
      batchSize: Option[Int] = None,
      options: Map[String, String] = Map.empty)

  def write(df: DataFrame, cfg: JdbcSinkConfig): Unit = {
    var w = df.write.format("jdbc").mode(cfg.mode)
      .option("url", cfg.url).option("dbtable", cfg.table)
    cfg.user.foreach(u => w = w.option("user", u))
    cfg.password.foreach(p => w = w.option("password", p))
    cfg.driver.foreach(d => w = w.option("driver", d))
    cfg.batchSize.foreach(n => w = w.option("batchsize", n.toString))
    w.options(cfg.options).save()
  }

  /** Reference-style write: the schema/data save modes run driver-side
    * first (create/recreate table, truncate, error checks — see
    * [[graft.sinks.SaveModes]]), then the rows append distributed. This is
    * the reference's SupportSaveMode sink contract
    * (seatunnel-api/.../sink/SupportSaveMode.java + DefaultSaveModeHandler).
    */
  def writeWithSaveMode(df: DataFrame, cfg: JdbcSinkConfig,
      schemaMode: graft.sinks.SaveModes.SchemaSaveMode,
      dataMode: graft.sinks.SaveModes.DataSaveMode,
      customSql: Option[String] = None): Unit = {
    val props = new java.util.Properties()
    cfg.user.foreach(props.setProperty("user", _))
    cfg.password.foreach(props.setProperty("password", _))
    val backend = new graft.sinks.SaveModes.JdbcBackend(cfg.url, cfg.table, df.schema, props)
    graft.sinks.SaveModes.handle(schemaMode, dataMode, backend, customSql)
    write(df, cfg.copy(mode = "append"))
  }
}
