package graft.api

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The reference's CONNECTOR e2e acceptance corpus, run VERBATIM:
  * connector-file-local-e2e (file formats, archives, encodings,
  * partition dirs, projections, multi-table), connector-fake-e2e
  * (FakeSource option surface), connector-assert-e2e (Assert grammar).
  * Each config's own Assert sink carries the expected values, so a run
  * completing IS the acceptance check — extra assertions below pin
  * outcomes the Assert grammar can't express.
  *
  * Configs address the reference testcontainer filesystem
  * (`/seatunnel/read/...`, `/tmp/...`); [[ConnectorFixtures]] stages the
  * same files/archives locally and [[Pipeline.rebasePaths]] maps the
  * paths — the local analog of the reference's container mounts. Config
  * ORDER follows the reference's own IT classes (LocalFileIT then
  * LocalFileWithMultipleTableIT — write configs stage directories that
  * later read configs consume, and the multi-table writer reuses a
  * directory the single-table pass reads while empty).
  *
  * All 57 file-local configs run (legacy BIFF .xls included — parsed by
  * graft.formats.BiffFormat, no POI needed).
  */
class ConnectorConfigSpec extends SparkSpec {

  private def load(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  private val e2eRoot = "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"

  private def runConf(module: String, rel: String): Map[String, org.apache.spark.sql.DataFrame] = {
    val conf = load(e2eRoot + module + "/src/test/resources/" + rel)
    val job = Pipeline.rebasePaths(Pipeline.parseHocon(conf), ConnectorFixtures.root)
    Pipeline.run(spark, job)
  }

  // ---- connector-file-local-e2e, LocalFileIT.testLocalFileReadAndWrite
  // order (LocalFileIT.java:300-360) ----

  private val localFileItOrder = Seq(
    "csv/fake_to_local_csv.conf",
    "csv/local_csv_to_assert.conf",
    "excel/fake_to_local_excel.conf",
    "excel/local_excel_to_assert.conf",
    "excel/local_excel_projection_to_assert.conf",
    "text/fake_to_local_file_text.conf",
    "text/local_file_text_lzo_to_assert.conf",
    "text/local_file_delimiter_assert.conf",
    "text/local_file_time_format_assert.conf",
    "text/local_file_text_skip_headers.conf",
    "text/local_file_text_to_assert.conf",
    "text/local_file_text_projection_to_assert.conf",
    "text/fake_to_local_file_with_encoding.conf",
    "text/local_file_text_to_console_with_encoding.conf",
    "text/local_file_null_format_assert.conf",
    "json/fake_to_local_file_json.conf",
    "json/local_file_json_to_assert.conf",
    "json/local_file_json_lzo_to_console.conf",
    "json/fake_to_local_file_json_with_encoding.conf",
    "json/local_file_json_to_console_with_encoding.conf",
    "orc/fake_to_local_file_orc.conf",
    "orc/local_file_orc_to_assert.conf",
    "orc/local_file_orc_projection_to_assert.conf",
    "orc/local_file_orc_to_assert_with_time_and_cast.conf",
    "parquet/fake_to_local_file_parquet.conf",
    "parquet/local_file_parquet_to_assert.conf",
    "parquet/local_file_parquet_projection_to_assert.conf",
    "excel/local_filter_excel_to_assert.conf",
    "json/local_file_to_console.conf",
    "parquet/local_file_to_console.conf",
    "binary/local_file_binary_to_local_file_binary.conf",
    "binary/local_file_binary_to_assert.conf",
    "xml/local_file_xml_to_assert.conf",
    "text/local_file_zip_text_to_assert.conf",
    "text/local_file_gz_text_to_assert.conf",
    "text/local_file_multi_zip_text_to_assert.conf",
    "text/local_file_tar_text_to_assert.conf",
    "text/local_file_multi_tar_text_to_assert.conf",
    "text/local_file_tar_gz_text_to_assert.conf",
    "text/local_file_multi_tar_gz_text_to_assert.conf",
    "json/local_file_json_zip_to_assert.conf",
    "json/local_file_json_gz_to_assert.conf",
    "json/local_file_json_multi_zip_to_assert.conf",
    "xml/local_file_zip_xml_to_assert.conf",
    "xml/local_file_gz_xml_to_assert.conf",
    "excel/local_excel_zip_to_assert.conf",
    "excel/local_excel_multi_zip_to_assert.conf",
    "excel/local_excel_xls_gz_to_assert.conf",
    "excel/local_excel_xlsx_gz_to_assert.conf",
    "json/fake_to_local_file_json_save_mode.conf")

  localFileItOrder.foreach { c =>
    test(s"reference e2e $c runs verbatim") {
      runConf("connector-file-local-e2e", c)
    }
  }

  // ---- LocalFileWithMultipleTableIT order (separate container in the
  // reference; runs after the single-table pass here) ----

  private val multipleTableItOrder = Seq(
    "text/fake_to_local_file_with_multiple_table.conf",
    "excel/local_excel_to_assert_with_multipletable.conf",
    "json/local_file_json_to_assert_with_multipletable.conf",
    "orc/local_file_orc_to_assert_with_multipletable.conf",
    "parquet/local_file_parquet_to_assert_with_multipletable.conf",
    "text/local_file_text_to_assert_with_multipletable.conf",
    "binary/local_file_binary_to_local_file_binary_with_multipletable.conf")

  multipleTableItOrder.foreach { c =>
    test(s"reference e2e $c (multiple-table IT) runs verbatim") {
      runConf("connector-file-local-e2e", c)
    }
  }

  // ---- connector-fake-e2e ----

  private val fakeConfigs = Seq(
    "fake_to_assert.conf",
    "fake_to_assert_with_range.conf",
    "fake_to_assert_with_template.conf",
    "fake_to_assert_with_tablenames.conf",
    "fake_to_assert_with_catalogtable.conf",
    "fake_generic_row_type_to_assert.conf",
    "fake_to_assert_with_compatible_source_and_result_table_name.conf",
    "fake_to_console_with_multitable_mode.conf",
    "fake_to_assert_verify_flink_metrics.conf")

  fakeConfigs.foreach { c =>
    test(s"reference e2e connector-fake $c runs verbatim") {
      runConf("connector-fake-e2e", c)
    }
  }

  // ---- connector-assert-e2e ----

  Seq("assertion/fakesource_to_assert.conf",
      "assertion/fake_full_types_to_assert.conf",
      "assertion/fake_row_to_assert.conf",
      "assertion/fakesource_to_multi_table_assert.conf").foreach { c =>
    test(s"reference e2e connector-assert $c runs verbatim") {
      runConf("connector-assert-e2e", c)
    }
  }
}
