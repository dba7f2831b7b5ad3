package graft.api

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Fidelity check: the reference's OWN example job configs run verbatim
  * through Graft's HOCON front end — the "switch engines without touching
  * your configs" claim, executed.
  */
class ReferenceConfigSpec extends SparkSpec {

  private def load(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  test("reference fake_to_console.conf runs verbatim") {
    val conf = load("/root/reference/seatunnel-examples/seatunnel-engine-examples/" +
      "src/main/resources/examples/fake_to_console.conf")
    val job = Pipeline.parseHocon(conf)
    assert(job.env("job.mode") == "BATCH")
    assert(job.sources.head.plugin == "FakeSource")
    assert(job.sinks.head.plugin == "Console")
    val catalog = Pipeline.run(spark, job)
    val fake = catalog("fake")
    assert(fake.count() == 5) // reference row.num default (5 x parallelism 1)
    assert(fake.columns.sorted.toSeq == Seq("age", "name"))
  }

  test("reference spark.batch.conf (full type-vocabulary FakeSource + sql) runs verbatim") {
    val conf = load("/root/reference/seatunnel-examples/seatunnel-spark-connector-v2-example/" +
      "src/main/resources/examples/spark.batch.conf")
    val job = Pipeline.parseHocon(conf)
    assert(job.sources.head.options.contains("schema"))
    val catalog = Pipeline.run(spark, job)
    val out = catalog("sql")
    // row.num=16 PER degree of parallelism (FakeOption), parallelism=2
    assert(out.count() == 32)
    // the sql transform's FROM dual projection binds to the fake input
    assert(out.columns.toSeq == Seq("c_map", "c_array", "c_string", "c_boolean",
      "c_tinyint", "c_smallint", "c_int", "c_bigint", "c_float", "c_double",
      "c_null", "c_bytes", "c_date", "c_timestamp"))
    val r = out.collect()(0)
    assert(r.getAs[scala.collection.Map[String, String]]("c_map").size == 2)
    assert(r.getAs[scala.collection.Seq[Int]]("c_array").length == 3)
  }

  private val e2e1 = "/root/reference/seatunnel-e2e/seatunnel-transforms-v2-e2e/" +
    "seatunnel-transforms-v2-e2e-part-1/src/test/resources/"
  private val e2e2 = "/root/reference/seatunnel-e2e/seatunnel-transforms-v2-e2e/" +
    "seatunnel-transforms-v2-e2e-part-2/src/test/resources/"

  test("reference e2e filter_transform.conf runs verbatim (incl. native Assert rules)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "filter_transform.conf"))
    val out = catalog("fake1")
    assert(out.columns.toSeq == Seq("age", "name", "c_row"))
    assert(out.count() == 100)
    // nested row schema materialized as a struct of structs
    assert(out.schema("c_row").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("c_row"))
  }

  test("reference e2e copy_transform.conf runs verbatim (single + multi copy forms)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "copy_transform.conf"))
    val out = catalog("fake2")
    assert(out.count() == 100)
    assert(Seq("name1", "id_1", "name2", "name3", "c_row_1").forall(out.columns.contains))
    val r = out.select("name", "name1", "name2").collect()(0)
    assert(r.getString(0) == r.getString(1) && r.getString(1) == r.getString(2))
  }

  test("reference e2e field_mapper config runs verbatim (ordered mapping + renames)") {
    val catalog = Pipeline.runHocon(spark,
      load(e2e2 + "field_mapper_transform_without_result_table.conf"))
    val out = catalog("fake1")
    // declared mapper order: id, age->age_as, int1->int1_as, name, c_row
    assert(out.columns.toSeq == Seq("id", "age_as", "int1_as", "name", "c_row"))
    assert(out.count() == 100)
  }

  test("reference e2e replace_transform.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(e2e2 + "replace_transform.conf"))
    val out = catalog("fake1")
    assert(out.count() == 100)
    assert(out.select("name").distinct().collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("reference e2e sql_transform.conf runs verbatim (TIME type, dual binding, pi())") {
    val catalog = Pipeline.runHocon(spark, load(e2e2 + "sql_transform.conf"))
    val out = catalog("fake1")
    assert(out.count() == 100)
    assert(out.columns.contains("pi"))
    assert(out.schema("c_time").dataType.typeName.startsWith("time"))
    val r = out.select("name", "pi").collect()(0)
    assert(r.getString(0) == "b" && math.abs(r.getDouble(1) - math.Pi) < 1e-12)
  }

  test("reference e2e filter_row_kind configs run verbatim (full kind names, implicit inserts)") {
    // exclude INSERT on a plain source -> everything filtered, asserts 0 rows
    val ex = Pipeline.runHocon(spark, load(e2e1 + "filter_row_kind_exclude_insert.conf"))
    assert(ex("fake1").count() == 0)
    // include INSERT -> everything kept, asserts 100 rows + field rules
    val in = Pipeline.runHocon(spark, load(e2e1 + "filter_row_kind_include_insert.conf"))
    assert(in("fake1").count() == 100)
    assert(!in("fake1").columns.contains("__row_kind")) // implicit kind stays internal
  }

  test("reference e2e rowkind_extractor_transform_case1.conf runs verbatim (literal rows)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "rowkind_extractor_transform_case1.conf"))
    val out = catalog("trans_result")
    assert(out.count() == 10)
    val kinds = out.select("custom_name").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("INSERT", "UPDATE_BEFORE", "UPDATE_AFTER", "DELETE"))
    // literal row values arrive typed per the declared schema
    assert(out.schema("pk_id").dataType.typeName == "long")
    assert(out.where(org.apache.spark.sql.functions.col("pk_id") === 1L).count() == 3)
  }

  test("reference e2e rowkind_extractor_transform_case2.conf runs verbatim (SHORT codes)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "rowkind_extractor_transform_case2.conf"))
    val out = catalog("trans_result")
    assert(out.count() == 10)
    val kinds = out.select("row_kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("+I", "-U", "+U", "-D"))
  }

  test("reference e2e table_merge_multi_table.conf runs verbatim (multi-table source/assert)") {
    val catalog = Pipeline.runHocon(spark, load(e2e2 + "table_merge_multi_table.conf"))
    // test.user_1 + test.user_2 merged into sink.user_all; test.xyz untouched
    assert(catalog("sink.user_all").count() == 6)
    assert(catalog("test.xyz").count() == 5)
    assert(!catalog.contains("test.user_1"))
  }

  test("reference e2e metadata_multi_table.conf runs verbatim (per-table overrides)") {
    val catalog = Pipeline.runHocon(spark, load(e2e2 + "metadata_multi_table.conf"))
    // regex-matched table gets the default metadata field
    assert(catalog("test.abc").columns.contains("rowKind"))
    // table_transform override renames it for test.xyz
    assert(catalog("test.xyz").columns.contains("rowKind2"))
    assert(!catalog("test.xyz").columns.contains("rowKind"))
    // untouched table keeps its literal fixture rows
    assert(!catalog("test.www").columns.exists(_.startsWith("rowKind")))
    assert(catalog("test.www").count() == 5)
    val names = catalog("test.abc").select("name").collect().map(_.getString(0)).toSet
    assert(names.contains("Jia Fan")) // literal rows, not generated values
  }

  test("reference e2e filter_transform_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "filter_transform_multi_table.conf"))
    assert(catalog("test.abc").columns.toSeq == Seq("age", "name")) // default keep-list
    assert(catalog("test.xyz").columns.toSeq == Seq("id", "name")) // per-table override
    assert(catalog("test.www").columns.toSeq == Seq("id", "name", "age")) // untouched
  }

  test("reference e2e copy_transform_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "copy_transform_multi_table.conf"))
    assert(catalog.keys.exists(_.startsWith("test.")))
    catalog.foreach { case (_, df) => assert(df.count() > 0) }
  }

  // ---- the reference's own SQL-engine acceptance configs (e2e part-2
  // sql_transform/ + json_path_transform/), run VERBATIM. Their Assert
  // sinks carry the expected values, so Pipeline.runHocon completing IS
  // the check; the extra assertions below pin schema-level outcomes the
  // Assert grammar can't express.

  private val sqlE2e = e2e2 + "sql_transform/"
  private val jsonE2e = e2e2 + "json_path_transform/"

  test("reference e2e func_string.conf runs verbatim (33 zeta string functions)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "func_string.conf"))
    val r = catalog("fake1").collect()(0)
    assert(r.getAs[String]("name15") == "Joy Ding") // des round trip
    assert(r.getAs[Long]("c4_2") == 8L) // zeta LENGTH is bigint
  }

  test("reference e2e func_numeric.conf runs verbatim (zeta int CEIL/FLOOR/SIGN, exact MOD)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "func_numeric.conf"))
    val r = catalog("fake1").collect()(0)
    assert(r.getAs[Int]("c5_1") == 14) // ceil -> Integer per NumericFunction
    assert(r.getAs[Double]("c4_2") == 2.2) // BigDecimal-exact MOD(13, 5.4)
  }

  test("reference e2e func_datetime.conf runs verbatim (dateadd/datediff/extract/date_trunc)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "func_datetime.conf"))
    val r = catalog("fake1").collect()(0)
    assert(r.getAs[Long]("test") == 283L) // zeta DATEDIFF(a,b) = b - a
    assert(r.getAs[Int]("c3_16") == 235) // extract(MILLISECOND)
    assert(r.getAs[java.sql.Timestamp]("c7_1") != null) // to_date w/ time fmt -> timestamp
  }

  test("reference e2e func_system.conf runs verbatim (zeta casts incl. int->date/time/timestamp)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "func_system.conf"))
    val out = catalog("fake1")
    assert(out.schema("c6").dataType.typeName.startsWith("time"))
    val r = out.collect()(0)
    // cast(1687747869032 as timestamp) reads MILLIS (zeta), not seconds
    assert(r.getAs[java.sql.Timestamp]("c4_1").toInstant.toEpochMilli == 1687747869032L)
    assert(r.getAs[java.sql.Date]("c5").toString == "2023-06-25")
  }

  test("reference e2e func_from_unixtime.conf runs verbatim (3-arg zone form)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "func_from_unixtime.conf"))
    assert(catalog("fake1").collect()(0).getAs[String]("ts") == "2023-01-01 00:00:00")
  }

  test("reference e2e func_array.conf runs verbatim (zeta array typing: mixed -> string)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "func_array.conf"))
    val out = catalog("fake")
    assert(out.schema("field_array_1").dataType.simpleString == "array<string>")
    assert(out.schema("double_array").dataType.simpleString == "array<double>")
    assert(out.schema("long_array").dataType.simpleString == "array<bigint>")
  }

  test("reference e2e func_split.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "func_split.conf"))
    assert(catalog("fake1").collect()(0).getSeq[String](1) == Seq("zhangsan", "zhangsan"))
  }

  test("reference e2e case_when.conf runs verbatim") {
    Pipeline.runHocon(spark, load(sqlE2e + "case_when.conf"))
  }

  test("reference e2e binary_expression.conf runs verbatim (double-literal arithmetic)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "binary_expression.conf"))
    // zeta fractional literals are DOUBLE: % is fmod, not decimal remainder
    assert(catalog("fake1").collect()(0).getAs[Double]("price3") == 18.619999999999994)
  }

  test("reference e2e criteria_filter.conf runs verbatim (predicate surface)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "criteria_filter.conf"))
    assert(catalog("fake1").collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("reference e2e inner_query.conf runs verbatim (nested row + map dot access)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "inner_query.conf"))
    val out = catalog("tmp1")
    assert(out.count() == 100)
    assert(out.select("map_val").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("innerQuery"))
  }

  test("reference e2e sql_all_columns.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "sql_all_columns.conf"))
    assert(catalog("fake1").columns.last == "id_")
  }

  test("reference e2e explode_transform.conf runs verbatim (column-replacing explode)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "explode_transform.conf"))
    assert(catalog("fake1").count() == 24) // the reference's own row count
  }

  test("reference e2e explode_transform_with_outer.conf runs verbatim (null rows kept)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "explode_transform_with_outer.conf"))
    assert(catalog("fake1").count() == 4)
  }

  test("reference e2e explode_transform_without_outer.conf runs verbatim (null elements dropped)") {
    val catalog = Pipeline.runHocon(spark, load(sqlE2e + "explode_transform_without_outer.conf"))
    assert(catalog("fake1").count() == 2)
  }

  test("reference e2e json_path nested_row_test.conf runs verbatim ($[i] on ROW columns)") {
    val catalog = Pipeline.runHocon(spark, load(jsonE2e + "nested_row_test.conf"))
    assert(catalog("fake1").schema("test_str").dataType.typeName == "string")
  }

  test("reference e2e json_path array_test.conf runs verbatim ($[i] on ARRAY columns)") {
    val catalog = Pipeline.runHocon(spark, load(jsonE2e + "array_test.conf"))
    assert(catalog("fake1").count() == 100)
  }

  test("reference e2e json_path_with_error_handle_way.conf runs verbatim (column SKIP)") {
    val catalog = Pipeline.runHocon(spark, load(jsonE2e + "json_path_with_error_handle_way.conf"))
    val rows = catalog.collectFirst { case (k, df) if k.endsWith("_out") => df }
      .get.orderBy("id").collect()
    assert(rows.length == 2)
    // row 1 lacks $.f2: column_error_handle_way=SKIP -> null, row kept
    assert(rows(0).getAs[String]("data_f2") == null)
    assert(rows(1).getAs[String]("data_f2") == "v2")
  }

  test("reference e2e split_transform.conf runs verbatim (split on an int field)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "split_transform.conf"))
    val out = catalog("fake1")
    assert(out.count() == 100)
    assert(Seq("f1", "f2").forall(out.columns.contains))
  }

  test("reference e2e split_transform_multi_table.conf: per-table split applies; " +
      "the fixture's own assert is unsatisfiable under reference split semantics") {
    // This fixture is not exercised by any reference IT (only
    // split_transform.conf is, TestSplitIT.java:32). Its f2-NOT_NULL rule
    // cannot hold: the reference SplitTransform pads missing positions
    // with null (SplitTransform.java:71-75), and an int age with no '1'
    // digit yields one split part. Graft reproduces those semantics, so
    // the run must fail in the Assert sink with f2 nulls — which proves
    // the multi-table Split + Assert machinery executed the config.
    val ex = intercept[graft.sinks.Sinks.AssertionFailed] {
      Pipeline.runHocon(spark, load(e2e1 + "split_transform_multi_table.conf"))
    }
    assert(ex.getMessage.matches(".*f[12] has \\d+ nulls.*"), ex.getMessage)
  }

  test("reference e2e filter_row_kind_exclude_delete.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "filter_row_kind_exclude_delete.conf"))
    assert(catalog("fake1").count() == 100) // plain rows are implicit inserts
  }

  test("reference e2e filter_row_kind_exclude_insert_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark,
      load(e2e1 + "filter_row_kind_exclude_insert_multi_table.conf"))
    assert(catalog("test.abc").count() == 0)
    assert(catalog("test.xyz").count() == 0)
    assert(catalog("test.www").count() == 100)
  }

  test("reference e2e rowkind_extractor_transform_case1_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark,
      load(e2e1 + "rowkind_extractor_transform_case1_multi_table.conf"))
    assert(catalog("test.abc").columns.contains("custom_name"))
    assert(catalog("test.xyz").columns.contains("custom_name"))
    assert(!catalog("test.www").columns.contains("custom_name"))
  }

  test("reference e2e field_mapper_transform.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(e2e2 + "field_mapper_transform.conf"))
    val out = catalog("fake1")
    assert(out.columns.toSeq == Seq("id", "age_as", "int1_as", "name", "c_row"))
    assert(out.count() == 100)
  }

  test("reference e2e field_mapper_transform_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark,
      load(e2e2 + "field_mapper_transform_multi_table.conf"))
    assert(catalog("test.abc").columns.contains("name_a"))
    assert(catalog("test.xyz").columns.contains("name_b"))
    assert(catalog("test.www").columns.toSeq == Seq("id", "name", "age"))
  }

  test("reference e2e replace_transform_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(e2e2 + "replace_transform_multi_table.conf"))
    assert(catalog("test.abc").select("name").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("b"))
    assert(catalog("test.xyz").select("name").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("b"))
    assert(catalog("test.www").select("name").distinct().count() > 1)
  }

  test("reference e2e spark_date_time_transform.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(e2e2 + "spark_date_time_transform.conf"))
    val out = catalog("fake1")
    assert(out.count() == 100)
    assert(out.schema("c_time").dataType.typeName == "timestamp")
    assert(out.schema("c_date").dataType.typeName == "date")
  }

  test("reference e2e sql_transform_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(e2e2 + "sql_transform_multi_table.conf"))
    assert(catalog("test.abc").columns.toSeq == Seq("id", "name1", "age"))
    assert(catalog("test.xyz").columns.toSeq == Seq("id", "name2", "age"))
    assert(catalog("test.www").columns.toSeq == Seq("id", "name", "age"))
  }

  test("reference e2e table_field_rename_multi_table.conf runs verbatim " +
      "(TableRename + FieldRename, scoped + overridden)") {
    val catalog = Pipeline.runHocon(spark, load(e2e2 + "table_field_rename_multi_table.conf"))
    assert(catalog.contains("TEST.P1_ABCC_S1"), s"catalog keys: ${catalog.keys}")
    assert(catalog.contains("TEST.P2_XYZZ_S2"))
    assert(catalog.contains("test.www"))
    assert(catalog("TEST.P1_ABCC_S1").columns.toSeq == Seq("F_P1_ID_S1_F", "F_P1_NAME_1_S1_F"))
    assert(catalog("TEST.P2_XYZZ_S2").columns.toSeq == Seq("F_P2_ID_1_S2_F", "F_P2_NAME_S2_F"))
    assert(catalog("test.www").columns.toSeq == Seq("id", "name"))
    assert(catalog("TEST.P1_ABCC_S1").count() == 3)
    assert(catalog("TEST.P2_XYZZ_S2").count() == 5)
  }

  test("reference e2e json_path_basic_type_test.conf runs verbatim (template source, typed casts)") {
    val catalog = Pipeline.runHocon(spark, load(jsonE2e + "json_path_basic_type_test.conf"))
    val out = catalog("fake1")
    assert(out.count() == 100)
    val r = out.collect()(0)
    assert(r.getAs[String]("c1_string") == "this is a string")
    assert(r.getAs[Boolean]("c1_boolean"))
    assert(r.getAs[Int]("c1_integer") == 42)
    assert(math.abs(r.getAs[Float]("c1_float") - 3.14f) < 1e-6)
    assert(r.getAs[java.math.BigDecimal]("c1_decimal").doubleValue() == 10.55)
    assert(r.getAs[java.sql.Date]("c1_date").toString == "2023-10-29")
    assert(out.schema("c1_datetime").dataType.typeName.startsWith("time"))
  }

  test("reference e2e json_path_basic_type_test_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark,
      load(jsonE2e + "json_path_basic_type_test_multi_table.conf"))
    assert(catalog("test.abc").select("c1_string").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("this is a string"))
    assert(catalog("test.xyz").select("c2_string").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("this is a string"))
    assert(!catalog("test.www").columns.exists(_.startsWith("c1_")))
  }

  // ---- embedding configs: the remote providers are unreachable by
  // design (sandbox); Graft's deterministic local embedder honors the
  // same config surface and vector column contract, so the reference
  // configs run verbatim — including their float_vector Assert rules.

  test("reference e2e embedding_transform.conf runs verbatim (3 providers, stub embedder)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "embedding_transform.conf"))
    Seq("embedding_output_1", "embedding_output_2", "embedding_output_3").foreach { t =>
      val out = catalog(t)
      assert(out.count() == 5)
      assert(out.schema("book_intro_vector").dataType.simpleString == "array<float>")
      assert(out.schema("author_biography_vector").dataType.simpleString == "array<float>")
    }
  }

  test("reference e2e embedding_transform_custom.conf runs verbatim (CUSTOM provider config)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "embedding_transform_custom.conf"))
    val out = catalog("embedding_output_1")
    assert(out.count() == 5)
    val v = out.orderBy("book_id").collect()(0).getSeq[Float](out.columns.indexOf("book_intro_vector"))
    assert(v.nonEmpty && math.abs(v.map(x => x * x).sum - 1.0f) < 1e-3) // L2-normalized
  }

  test("reference e2e embedding_transform_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "embedding_transform_multi_table.conf"))
    assert(catalog.keys.exists(_.startsWith("test.")))
    val withVec = catalog.filter(_._2.columns.contains("book_intro_vector"))
    assert(withVec.nonEmpty)
  }

  // ---- LLM configs: remote chat endpoints are unreachable by design;
  // the deterministic stub provider honors the same config surface
  // (prompt, inference_columns, output_column_name, output_data_type),
  // so the reference configs run verbatim incl. their Assert rules.

  test("reference e2e llm_openai_transform.conf runs verbatim (stub provider)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "llm_openai_transform.conf"))
    val out = catalog("llm_output")
    assert(out.count() == 5)
    assert(out.select("llm_output").collect().forall(!_.isNullAt(0)))
  }

  test("reference e2e llm_openai_transform_boolean.conf runs verbatim (boolean output cast)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "llm_openai_transform_boolean.conf"))
    assert(catalog("llm_output").schema("llm_output").dataType.typeName == "boolean")
  }

  test("reference e2e llm_openai_transform_custom_output_name.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark,
      load(e2e1 + "llm_openai_transform_custom_output_name.conf"))
    assert(catalog("llm_output").columns.contains("nationality"))
  }

  test("reference e2e llm_openai_transform_columns.conf runs verbatim (inference_columns)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "llm_openai_transform_columns.conf"))
    assert(catalog("llm_output").select("llm_output").collect().forall(!_.isNullAt(0)))
  }

  test("reference e2e llm_transform_custom.conf runs verbatim (CUSTOM provider config)") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "llm_transform_custom.conf"))
    assert(catalog("llm_output").select("llm_output").collect().forall(!_.isNullAt(0)))
  }

  test("reference e2e llm_kimiai/_microsoft transform configs run verbatim") {
    Seq("llm_kimiai_transform.conf", "llm_microsoft_transform.conf").foreach { f =>
      val catalog = Pipeline.runHocon(spark, load(e2e1 + f))
      assert(catalog("llm_output").select("llm_output").collect().forall(!_.isNullAt(0)))
    }
  }

  test("reference e2e llm_openai_transform_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "llm_openai_transform_multi_table.conf"))
    assert(catalog.keys.exists(_.startsWith("test.")))
  }

  test("reference e2e filter_row_to_next_transform.json runs verbatim (JSON job format)") {
    val catalog = Pipeline.runJson(spark, load(e2e1 + "filter_row_to_next_transform.json"))
    // FilterRowKind excludes the implicit INSERTs, Copy chains on the result
    assert(catalog("fake2").count() == 0)
    assert(Seq("name1", "age1", "card1").forall(catalog("fake2").columns.contains))
  }

  private val engineE2e = "/root/reference/seatunnel-e2e/seatunnel-engine-e2e/" +
    "connector-seatunnel-e2e-base/src/test/resources/"

  test("reference e2e fake_to_console.variables.conf runs verbatim (CLI job variables)") {
    // same variable bindings as the reference's UserVariableIT.java:36-43
    // (their resName embeds a shell $(date); any opaque identifier is
    // equivalent after the shell resolves it)
    val vars = Map(
      "resName" -> "a20260813", "rowNum" -> "10", "strTemplate" -> "[abc,def]",
      "nameType" -> "string", "nameVal" -> "abc", "pluginInputIdentifier" -> "sql")
    val catalog = Pipeline.runHocon(spark,
      load(engineE2e + "fake_to_console.variables.conf"), vars)
    val out = catalog("sql")
    val names = out.select("name").collect().map(_.getString(0))
    assert(names.nonEmpty && names.forall(_ == "abc"))
    assert(catalog("a20260813").count() == 20) // rowNum 10 x parallelism 2
  }

  test("reference e2e fake_to_console_with_default_value.variables.conf runs verbatim") {
    // reference UserVariableIT.java:51-56 binds only these four; the rest
    // fall back to the config's ${name:default} values
    val vars = Map("strTemplate" -> "[abc,def]", "ageType" -> "int",
      "nameVal" -> "abc", "pluginInputIdentifier" -> "sql")
    val catalog = Pipeline.runHocon(spark,
      load(engineE2e + "fake_to_console_with_default_value.variables.conf"), vars)
    assert(catalog("fake_test_table").count() == 100) // rowNum default 50 x parallelism 2
    val ages = catalog("fake_test_table").select("age").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(ages.subsetOf(Set(20, 21))) // int.template
    assert(catalog("sql").select("name").collect().forall(_.getString(0) == "abc"))
  }

  test("reference e2e batch_fake_multi_table_to_console.conf runs verbatim " +
      "(literal rows with row kinds, two sources, two console sinks)") {
    val catalog = Pipeline.runHocon(spark,
      load(engineE2e + "batch_fake_multi_table_to_console.conf"))
    assert(catalog("fake1").count() == 10) // 6 inserts + U-/U+ + delete + insert
    assert(catalog("fake2").count() == 5)
  }

  test("hocon parser handles comments, commas, arrays, quoted strings, repeats") {
    val o = Hocon.parse(
      """# leading comment
        |a = 1, b: "two words" // trailing
        |list = [x, "y z", 3]
        |blk { inner = true
        |  nested { deep = "#notcomment" } }
        |blk { inner = false }
        |""".stripMargin)
    assert(o.get("a").contains(Hocon.Scalar("1")))
    assert(o.get("b").contains(Hocon.Scalar("two words")))
    assert(o.get("list").contains(Hocon.Arr(Seq(
      Hocon.Scalar("x"), Hocon.Scalar("y z"), Hocon.Scalar("3")))))
    // repeated keys preserved in order
    assert(o.entries.count(_._1 == "blk") == 2)
    val nested = o.entries.collect { case ("blk", v: Hocon.Obj) => v }.head
    assert(nested.get("nested").exists(_.isInstanceOf[Hocon.Obj]))
  }
}
