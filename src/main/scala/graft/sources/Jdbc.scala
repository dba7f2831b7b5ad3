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

  /** Key-based upsert — the reference's primary-key sink path
    * (connector-jdbc JdbcSinkConfig: `primary_keys`; portable strategy =
    * `support_upsert_by_query_primary_key_exist`, the fallback every
    * dialect supports). Per partition, rows stream through a batched
    * UPDATE..WHERE keys; rows whose update matched nothing re-batch into
    * an INSERT. Rows are hash-partitioned by key first so each key is
    * written by exactly one task — the update/insert pair per key is then
    * race-free without needing a unique constraint — and the whole op is
    * one exchange + parallel database writes, no driver funnel.
    */
  def upsert(df: DataFrame, cfg: JdbcSinkConfig, keys: Seq[String]): Unit = {
    val cols = df.schema.fieldNames.toSeq
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"jdbc upsert: primary keys $keys must be columns of ${cols.mkString(",")}")
    val nonKeys = cols.filterNot(keys.contains)
    def q(c: String) = s""""$c""""
    val insertSql = s"""INSERT INTO ${cfg.table} (${cols.map(q).mkString(", ")})
                       |VALUES (${cols.map(_ => "?").mkString(", ")})""".stripMargin
    val updateSql =
      if (nonKeys.isEmpty) null
      else s"""UPDATE ${cfg.table}
              |SET ${nonKeys.map(c => s"${q(c)} = ?").mkString(", ")}
              |WHERE ${keys.map(k => s"${q(k)} = ?").mkString(" AND ")}""".stripMargin
    val existsSql = s"""SELECT 1 FROM ${cfg.table}
                       |WHERE ${keys.map(k => s"${q(k)} = ?").mkString(" AND ")}""".stripMargin
    val batch = cfg.batchSize.getOrElse(500)
    val (url, user, pass) = (cfg.url, cfg.user, cfg.password)
    val colIdx = cols.zipWithIndex.toMap
    val updOrder = (nonKeys ++ keys).map(colIdx)
    val keyOrder = keys.map(colIdx)

    df.repartition(keys.map(org.apache.spark.sql.functions.col): _*)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val props = new java.util.Properties()
        user.foreach(props.setProperty("user", _))
        pass.foreach(props.setProperty("password", _))
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          val ins = conn.prepareStatement(insertSql)
          val upd = if (updateSql != null) conn.prepareStatement(updateSql) else null
          val exists = if (updateSql == null) conn.prepareStatement(existsSql) else null

          def flush(rows: Seq[org.apache.spark.sql.Row]): Unit = if (rows.nonEmpty) {
            val missed =
              if (upd != null) {
                rows.foreach { r =>
                  updOrder.zipWithIndex.foreach { case (src, i) => upd.setObject(i + 1, r.get(src)) }
                  upd.addBatch()
                }
                rows.zip(upd.executeBatch()).collect { case (r, 0) => r }
              } else rows.filter { r =>
                keyOrder.zipWithIndex.foreach { case (src, i) => exists.setObject(i + 1, r.get(src)) }
                val rs = exists.executeQuery()
                try !rs.next() finally rs.close()
              }
            missed.foreach { r =>
              cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
              ins.addBatch()
            }
            ins.executeBatch()
          }

          it.grouped(batch).foreach(g => flush(g.toSeq))
        } finally conn.close()
      }
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
