package graft.api

import java.nio.file.Files

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("JSON job config: FakeSource -> Sql + Split -> File sink") {
    val out = Files.createTempDirectory("graft-pipe").toString + "/out"
    val config =
      s"""{
         |  "source": [{
         |    "plugin": "FakeSource", "plugin_output": "fake",
         |    "row.num": 50,
         |    "schema": {"fields": {"name": "string", "num": "int"}}
         |  }],
         |  "transform": [
         |    {"plugin": "Sql", "plugin_input": "fake", "plugin_output": "sel",
         |     "query": "SELECT name, num, num % 10 AS bucket FROM fake WHERE num >= 0"},
         |    {"plugin": "Split", "plugin_input": "sel", "plugin_output": "split",
         |     "separator": "_", "split_field": "name", "output_fields": ["prefix", "suffix"]}
         |  ],
         |  "sink": [{"plugin": "File", "plugin_input": "split",
         |            "path": "$out", "file_format_type": "parquet"}]
         |}""".stripMargin
    val catalog = Pipeline.runJson(spark, config)
    assert(catalog.keySet == Set("fake", "sel", "split"))
    val written = spark.read.parquet(out)
    assert(written.count() == 50)
    assert(written.columns.toSet == Set("name", "num", "bucket", "prefix", "suffix"))
    // split of "name_<i>" -> prefix "name"
    assert(written.select("prefix").distinct().collect().map(_.getString(0)).toSeq == Seq("name"))
  }

  test("runWithMetrics reports rows written per sink via observe") {
    val out = Files.createTempDirectory("graft-metrics").toString + "/out"
    val config =
      s"""{
         |  "source": [{"plugin": "FakeSource", "plugin_output": "f", "row.num": 42,
         |              "schema": {"fields": {"num": "int"}}}],
         |  "sink": [{"plugin": "File", "plugin_input": "f",
         |            "path": "$out", "file_format_type": "parquet"}]
         |}""".stripMargin
    val (_, metrics) = Pipeline.runWithMetrics(spark, Pipeline.parse(config))
    assert(metrics == Map("File[f]" -> 42L))
  }

  test("Assert sink integrates and fails the job on violation") {
    val config =
      """{
        |  "source": [{"plugin": "FakeSource", "plugin_output": "f", "row.num": 5,
        |              "schema": {"fields": {"num": "int"}}}],
        |  "sink": [{"plugin": "Assert", "plugin_input": "f",
        |            "rules": [{"rule": "row_count_between", "min": 100, "max": 200}]}]
        |}""".stripMargin
    intercept[graft.sinks.Sinks.AssertionFailed] { Pipeline.runJson(spark, config) }
  }

  test("STREAMING job: file stream source -> Sql transform -> memory sink") {
    val dir = Files.createTempDirectory("graft-streampipe").toString
    spark.range(0, 6).selectExpr("id", "concat('u', id) AS name")
      .coalesce(1).write.mode("overwrite").json(dir)
    val job = Pipeline.parse(
      s"""{
         |  "env": {"job.mode": "STREAMING"},
         |  "source": [{"plugin": "LocalFile", "plugin_output": "ev",
         |              "path": "$dir", "file_format_type": "json",
         |              "schema": "id BIGINT, name STRING"}],
         |  "transform": [{"plugin": "Sql", "plugin_input": "ev", "plugin_output": "big",
         |                 "query": "SELECT id, UPPER(name) AS name FROM ev WHERE id >= 3"}],
         |  "sink": [{"plugin": "Memory", "plugin_input": "big", "query_name": "pipe_out"}]
         |}""".stripMargin)
    val queries = Pipeline.runStreaming(spark, job)
    try {
      queries.foreach(_.processAllAvailable())
      val rows = spark.table("pipe_out").collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(rows.toSeq == Seq((3L, "U3"), (4L, "U4"), (5L, "U5")))
    } finally queries.foreach(_.stop())
  }

  test("Embedding, LLM, and DynamicCompile plugins work from config") {
    val job = Pipeline.parse(
      """{
        |  "source": [{"plugin": "FakeSource", "plugin_output": "docs", "row.num": 4,
        |              "schema": {"fields": {"body": "string"}}}],
        |  "transform": [
        |    {"plugin": "Embedding", "plugin_input": "docs", "plugin_output": "emb",
        |     "dimension": 8, "vectorization_fields": {"vec": "body"}},
        |    {"plugin": "LLM", "plugin_input": "emb", "plugin_output": "labeled",
        |     "src_field": "body", "output_field": "label", "labels": ["body", "zz"]},
        |    {"plugin": "DynamicCompile", "plugin_input": "labeled", "plugin_output": "dyn",
        |     "row_schema": "body STRING, vec ARRAY<FLOAT>, label STRING, flag STRING",
        |     "source_code": "(r: org.apache.spark.sql.Row) => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2), \"ok\")"}
        |  ]
        |}""".stripMargin)
    val catalog = Pipeline.run(spark, job)
    val rows = catalog("dyn").collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[String]("label") == "body")) // body_<i> contains 'body'
    assert(rows.forall(_.getAs[String]("flag") == "ok"))
    assert(rows.forall(_.getAs[Seq[Float]]("vec").length == 8))
  }

  test("multi-table transform applies to every table matching table_match_regex") {
    val job = Pipeline.parse(
      """{
        |  "source": [
        |    {"plugin": "FakeSource", "plugin_output": "shard_1", "row.num": 2,
        |     "schema": {"fields": {"a": "int"}}},
        |    {"plugin": "FakeSource", "plugin_output": "shard_2", "row.num": 2,
        |     "schema": {"fields": {"a": "int"}}},
        |    {"plugin": "FakeSource", "plugin_output": "other", "row.num": 2,
        |     "schema": {"fields": {"a": "int"}}}
        |  ],
        |  "transform": [{"plugin": "FieldRename", "table_match_regex": "shard_.*",
        |                 "fields": {"a": "renamed"}}]
        |}""".stripMargin)
    val catalog = Pipeline.run(spark, job)
    assert(catalog("shard_1").columns.toSeq == Seq("renamed"))
    assert(catalog("shard_2").columns.toSeq == Seq("renamed"))
    assert(catalog("other").columns.toSeq == Seq("a"))
  }

  test("TableRename / TableMerge / TableFilter are catalog-level plugins") {
    val job = Pipeline.parse(
      """{
        |  "source": [
        |    {"plugin": "FakeSource", "plugin_output": "shard_1", "row.num": 2,
        |     "schema": {"fields": {"a": "int"}}},
        |    {"plugin": "FakeSource", "plugin_output": "shard_2", "row.num": 3,
        |     "schema": {"fields": {"a": "int"}}},
        |    {"plugin": "FakeSource", "plugin_output": "tmp_scratch", "row.num": 1,
        |     "schema": {"fields": {"a": "int"}}}
        |  ],
        |  "transform": [
        |    {"plugin": "TableFilter", "patterns": ["shard_.*"]},
        |    {"plugin": "TableRename", "prefix": "ods_", "convert_case": "UPPER",
        |     "replacements_with_regex": [{"replace_from": "shard", "replace_to": "tbl"}]},
        |    {"plugin": "TableMerge", "table_match_regex": "ods_tbl_.*",
        |     "output_table": "merged", "tag_source_table": true}
        |  ]
        |}""".stripMargin)
    val catalog = Pipeline.run(spark, job)
    assert(catalog.keySet == Set("merged"))
    val merged = catalog("merged")
    assert(merged.count() == 5)
    // reference convertName order: case converts the original name, the
    // spliced replacement text and the affixes attach unconverted
    assert(merged.select("__meta_table").distinct().collect().map(_.getString(0)).sorted.toSeq ==
      Seq("ods_tbl_1", "ods_tbl_2"))
  }

  test("FieldRename supports convert_case, affixes, and regex replacements") {
    val config =
      """{
        |  "source": [{"plugin": "FakeSource", "plugin_output": "f", "row.num": 2,
        |              "schema": {"fields": {"user_name": "string", "user_age": "int"}}}],
        |  "transform": [{"plugin": "FieldRename", "plugin_input": "f", "plugin_output": "out",
        |    "prefix": "c_", "convert_case": "UPPER",
        |    "replacements_with_regex": [{"replace_from": "user_", "replace_to": ""}]}]
        |}""".stripMargin
    val catalog = Pipeline.runJson(spark, config)
    // convertCase uppercases the original name; replacement splice and
    // prefix attach unconverted (reference FieldRenameTransform.convertName)
    assert(catalog("out").columns.toSet == Set("c_NAME", "c_AGE"))
  }

  test("TableRename keeps the implicit transform chain threaded") {
    val config =
      """{
        |  "source": [{"plugin": "FakeSource", "plugin_output": "f", "row.num": 3,
        |              "schema": {"fields": {"a": "int"}}}],
        |  "transform": [
        |    {"plugin": "TableRename", "suffix": "_renamed"},
        |    {"plugin": "Filter", "include_fields": ["a"]}
        |  ]
        |}""".stripMargin
    val catalog = Pipeline.runJson(spark, config)
    assert(catalog.contains("f_renamed"))
    assert(catalog("f_renamed_out").columns.toSeq == Seq("a"))
  }

  test("Kafka streaming source shell maps reference options (module absent here)") {
    val job = Pipeline.parse(
      """{"env": {"job.mode": "STREAMING"},
        |  "source": [{"plugin": "Kafka", "plugin_output": "k",
        |              "bootstrap.servers": "broker:9092", "topic": "t",
        |              "start_mode": "earliest"}],
        |  "sink": [{"plugin": "Console", "plugin_input": "k"}]
        |}""".stripMargin)
    // spark-sql-kafka is not on this classpath: the config must reach
    // format resolution (proving the mapping), then fail on the missing
    // data source — not on option handling.
    val e = intercept[Exception] { Pipeline.runStreaming(spark, job) }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }

  test("Http source shell validates reference options (no egress here)") {
    def job(src: String) = Pipeline.parse(
      s"""{"source": [$src],
         |  "sink": [{"plugin": "Console", "plugin_input": "h"}]
         |}""".stripMargin)
    // missing url fails option validation
    val e1 = intercept[IllegalArgumentException] {
      Pipeline.run(spark, job("""{"plugin": "Http", "plugin_output": "h"}"""))
    }
    assert(e1.getMessage.contains("url"))
    // bad method fails option validation
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, job(
        """{"plugin": "Http", "plugin_output": "h",
          | "url": "http://example.invalid/data", "method": "PATCH"}""".stripMargin))
    }
    // valid config reaches the fetch, which reports the sandbox clearly
    val e2 = intercept[UnsupportedOperationException] {
      Pipeline.run(spark, job(
        """{"plugin": "Http", "plugin_output": "h",
          | "url": "http://example.invalid/data", "method": "GET",
          | "format": "json"}""".stripMargin))
    }
    assert(e2.getMessage.contains("example.invalid"))
  }

  test("env block: parallelism and job.mode are honored") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val job = Pipeline.parse(
        """{"env": {"job.mode": "BATCH", "parallelism": 7},
          |  "source": [{"plugin": "FakeSource", "plugin_output": "f", "row.num": 2,
          |              "schema": {"fields": {"a": "int"}}}]
          |}""".stripMargin)
      assert(!job.isStreaming)
      Pipeline.run(spark, job)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("transform chain without explicit inputs threads the last output") {
    val config =
      """{
        |  "source": [{"plugin": "FakeSource", "plugin_output": "f", "row.num": 3,
        |              "schema": {"fields": {"a": "int", "b": "string"}}}],
        |  "transform": [
        |    {"plugin": "Filter", "include_fields": ["a"]},
        |    {"plugin": "FieldRename", "fields": {"a": "renamed"}}
        |  ],
        |  "sink": [{"plugin": "Console", "limit": 1}]
        |}""".stripMargin
    val catalog = Pipeline.runJson(spark, config)
    assert(catalog("f_out_out").columns.toSeq == Seq("renamed"))
  }
}
