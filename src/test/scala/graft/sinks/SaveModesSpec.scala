package graft.sinks

import java.sql.DriverManager

import graft.SparkSpec
import graft.sinks.SaveModes.{DataSaveMode => D, SchemaSaveMode => S}
import graft.sources.Jdbc

/** Save-mode matrix per the reference DefaultSaveModeHandler: each schema
  * mode x (exists / not-exists) and each data mode x (data / empty),
  * against embedded Derby (JDBC) and the local filesystem (file sink).
  */
class SaveModesSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftsm;create=true"
  private var n = 0
  private def freshTable(): String = { n += 1; s"sm_t$n" }

  private def df2 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

  private def rows(table: String): Seq[Long] =
    Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some(table)))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def jdbcWrite(table: String, sm: S, dm: D,
      customSql: Option[String] = None): Unit =
    Jdbc.writeWithSaveMode(df2, Jdbc.JdbcSinkConfig(url, table), sm, dm, customSql)

  // ---------- JDBC schema modes ----------

  test("jdbc CREATE_SCHEMA_WHEN_NOT_EXIST creates a missing table, keeps an existing one") {
    val t = freshTable()
    jdbcWrite(t, S.CreateWhenNotExist, D.AppendData) // not exists -> created
    assert(rows(t) == Seq(1L, 2L))
    jdbcWrite(t, S.CreateWhenNotExist, D.AppendData) // exists -> kept, appended
    assert(rows(t) == Seq(1L, 1L, 2L, 2L))
  }

  test("jdbc RECREATE_SCHEMA drops and recreates an existing table") {
    val t = freshTable()
    jdbcWrite(t, S.CreateWhenNotExist, D.AppendData)
    jdbcWrite(t, S.Recreate, D.AppendData) // rebuilt: old rows gone
    assert(rows(t) == Seq(1L, 2L))
    jdbcWrite(t, S.Recreate, D.AppendData) // also fine when absent-ish
    assert(rows(t) == Seq(1L, 2L))
  }

  test("jdbc ERROR_WHEN_SCHEMA_NOT_EXIST fails on a missing table, passes on an existing one") {
    val t = freshTable()
    intercept[SaveModes.SaveModeException] {
      jdbcWrite(t, S.ErrorWhenNotExist, D.AppendData)
    }
    jdbcWrite(t, S.CreateWhenNotExist, D.AppendData)
    jdbcWrite(t, S.ErrorWhenNotExist, D.AppendData)
    assert(rows(t) == Seq(1L, 1L, 2L, 2L))
  }

  // ---------- JDBC data modes ----------

  test("jdbc DROP_DATA truncates existing rows but keeps the table") {
    val t = freshTable()
    jdbcWrite(t, S.CreateWhenNotExist, D.AppendData)
    jdbcWrite(t, S.CreateWhenNotExist, D.DropData)
    assert(rows(t) == Seq(1L, 2L)) // not 1,1,2,2
  }

  test("jdbc DROP_DATA on a just-created table skips the truncate (reference isNewTableCreated)") {
    val t = freshTable()
    jdbcWrite(t, S.CreateWhenNotExist, D.DropData)
    assert(rows(t) == Seq(1L, 2L))
  }

  test("jdbc ERROR_WHEN_DATA_EXISTS fails only when rows exist") {
    val t = freshTable()
    jdbcWrite(t, S.CreateWhenNotExist, D.ErrorWhenDataExists) // empty -> ok
    assert(rows(t) == Seq(1L, 2L))
    intercept[SaveModes.SaveModeException] {
      jdbcWrite(t, S.CreateWhenNotExist, D.ErrorWhenDataExists)
    }
  }

  test("jdbc CUSTOM_PROCESSING runs the user SQL before the write") {
    val t = freshTable()
    jdbcWrite(t, S.CreateWhenNotExist, D.AppendData)
    // column names are quoted in the generated DDL (same as Spark's JDBC
    // writer), so custom SQL quotes them too
    jdbcWrite(t, S.CreateWhenNotExist, D.CustomProcessing,
      customSql = Some(s"""DELETE FROM $t WHERE "id" = 1"""))
    assert(rows(t) == Seq(1L, 2L, 2L))
    intercept[IllegalArgumentException] {
      jdbcWrite(t, S.CreateWhenNotExist, D.CustomProcessing, customSql = None)
    }
  }

  test("jdbc generated DDL preserves nullability and types") {
    val t = freshTable()
    val df = Seq((1, "x", 2.5)).toDF("i", "s", "d")
    Jdbc.writeWithSaveMode(df, Jdbc.JdbcSinkConfig(url, t), S.CreateWhenNotExist, D.AppendData)
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getColumns(null, null, t.toUpperCase, null)
      val cols = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => r.getString("COLUMN_NAME") -> r.getString("TYPE_NAME")).toMap
      assert(cols("i") == "INTEGER" && cols("s") == "VARCHAR" && cols("d") == "DOUBLE")
    } finally conn.close()
  }

  // ---------- file sink ----------

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sm_$tag").toString + "/out"

  private def fileWrite(path: String, sm: S, dm: D): Unit =
    Sinks.writeFileWithSaveMode(df2, Sinks.FileSinkConfig(path, "parquet"), sm, dm)

  test("file RECREATE_SCHEMA replaces directory contents; CREATE_WHEN_NOT_EXIST appends") {
    val p = tmp("recreate")
    fileWrite(p, S.CreateWhenNotExist, D.AppendData)
    assert(spark.read.parquet(p).count() == 2)
    fileWrite(p, S.CreateWhenNotExist, D.AppendData)
    assert(spark.read.parquet(p).count() == 4)
    fileWrite(p, S.Recreate, D.AppendData)
    assert(spark.read.parquet(p).count() == 2)
  }

  test("file ERROR_WHEN_SCHEMA_NOT_EXIST and ERROR_WHEN_DATA_EXISTS enforce pre-state") {
    val p = tmp("errors")
    intercept[SaveModes.SaveModeException] { fileWrite(p, S.ErrorWhenNotExist, D.AppendData) }
    fileWrite(p, S.CreateWhenNotExist, D.ErrorWhenDataExists) // empty dir ok
    assert(spark.read.parquet(p).count() == 2)
    intercept[SaveModes.SaveModeException] {
      fileWrite(p, S.CreateWhenNotExist, D.ErrorWhenDataExists)
    }
  }

  test("file DROP_DATA clears files, keeps the directory") {
    val p = tmp("dropdata")
    fileWrite(p, S.CreateWhenNotExist, D.AppendData)
    fileWrite(p, S.Ignore, D.DropData)
    assert(spark.read.parquet(p).count() == 2)
    assert(new java.io.File(p).exists())
  }

  test("save modes reach sinks through Pipeline config options") {
    val t = freshTable()
    val job =
      s"""{"source":[{"plugin":"FakeSource","plugin_output":"src",
         |  "schema":{"fields":{"id":"long"}}, "row.num": 3}],
         |"sink":[{"plugin":"Jdbc","plugin_input":"src","url":"$url","table":"$t",
         |  "schema_save_mode":"CREATE_SCHEMA_WHEN_NOT_EXIST",
         |  "data_save_mode":"DROP_DATA"}]}""".stripMargin
    graft.api.Pipeline.run(spark, graft.api.Pipeline.parse(job))
    graft.api.Pipeline.run(spark, graft.api.Pipeline.parse(job)) // idempotent under DROP_DATA
    assert(Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some(t))).count() == 3)
  }

  test("jdbc upsert merges by primary key: updates existing rows, inserts new ones") {
    val t = freshTable()
    Jdbc.writeWithSaveMode(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "v", "score"),
      Jdbc.JdbcSinkConfig(url, t), S.CreateWhenNotExist, D.AppendData)
    // upsert: id 2 updated, id 3 inserted, id 1 untouched
    Jdbc.upsert(
      Seq((2L, "b2", 20.0), (3L, "c", 3.0)).toDF("id", "v", "score"),
      Jdbc.JdbcSinkConfig(url, t), keys = Seq("id"))
    val got = Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some(t)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0)))
    // idempotent: re-running the same upsert changes nothing
    Jdbc.upsert(
      Seq((2L, "b2", 20.0), (3L, "c", 3.0)).toDF("id", "v", "score"),
      Jdbc.JdbcSinkConfig(url, t), keys = Seq("id"))
    assert(Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some(t))).count() == 3)
    // unknown key column rejected
    intercept[IllegalArgumentException] {
      Jdbc.upsert(Seq((1L, "x", 0.0)).toDF("id", "v", "score"),
        Jdbc.JdbcSinkConfig(url, t), keys = Seq("nope"))
    }
  }

  test("Pipeline Jdbc sink with primary_keys upserts idempotently") {
    val t = freshTable()
    val job =
      s"""{"source":[{"plugin":"FakeSource","plugin_output":"src",
         |  "schema":{"fields":{"id":"long"}}, "row.num": 4}],
         |"sink":[{"plugin":"Jdbc","plugin_input":"src","url":"$url","table":"$t",
         |  "schema_save_mode":"CREATE_SCHEMA_WHEN_NOT_EXIST",
         |  "primary_keys":["id"]}]}""".stripMargin
    graft.api.Pipeline.run(spark, graft.api.Pipeline.parse(job))
    graft.api.Pipeline.run(spark, graft.api.Pipeline.parse(job)) // second run: pure update
    assert(Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some(t))).count() == 4)
  }

  test("mode names parse case-insensitively and reject unknowns") {
    assert(S.parse("recreate_schema") == S.Recreate)
    assert(D.parse("APPEND_DATA") == D.AppendData)
    intercept[IllegalArgumentException] { S.parse("nope") }
    intercept[IllegalArgumentException] { D.parse("nope") }
  }
}
