package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec
import graft.api.Pipeline

/** JAVA-language DynamicCompile: javax.tools hot-compile of the
  * reference's own e2e snippets, run verbatim from their configs.
  */
class DynamicJavaCompileSpec extends SparkSpec {
  import spark.implicits._

  private val confDir = "/root/reference/seatunnel-e2e/seatunnel-transforms-v2-e2e/" +
    "seatunnel-transforms-v2-e2e-part-2/src/test/resources/dynamic_compile/"

  private def load(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  test("applyCompiledJava compiles java source and reads input fields") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val src =
      """import org.apache.seatunnel.api.table.catalog.Column;
        |import org.apache.seatunnel.api.table.catalog.CatalogTable;
        |import org.apache.seatunnel.api.table.catalog.PhysicalColumn;
        |import org.apache.seatunnel.api.table.type.BasicType;
        |import org.apache.seatunnel.api.table.type.SeaTunnelRowAccessor;
        |public Column[] getInlineOutputColumns(CatalogTable t) {
        |  return new Column[] {
        |    PhysicalColumn.of("shout", BasicType.STRING_TYPE, 10, true, "", ""),
        |    PhysicalColumn.of("id2", BasicType.INT_TYPE, 10, true, "", "")
        |  };
        |}
        |public Object[] getInlineOutputFieldValues(SeaTunnelRowAccessor row) {
        |  return new Object[] { row.getField(1) + "!", (Integer) row.getField(0) * 2 };
        |}
        |""".stripMargin
    val out = DynamicOp.applyCompiledJava(df, src).orderBy("id").collect()
    assert(out.map(_.getAs[String]("shout")).toSeq == Seq("a!", "b!"))
    assert(out.map(_.getAs[Int]("id2")).toSeq == Seq(2, 4))
  }

  test("output column differing only in case REPLACES the input column " +
      "(no ambiguous duplicates under case-insensitive resolution; ADVICE r5 carry-over)") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val src =
      """import org.apache.seatunnel.api.table.catalog.Column;
        |import org.apache.seatunnel.api.table.catalog.CatalogTable;
        |import org.apache.seatunnel.api.table.catalog.PhysicalColumn;
        |import org.apache.seatunnel.api.table.type.BasicType;
        |import org.apache.seatunnel.api.table.type.SeaTunnelRowAccessor;
        |public Column[] getInlineOutputColumns(CatalogTable t) {
        |  return new Column[] {
        |    PhysicalColumn.of("NAME", BasicType.STRING_TYPE, 10, true, "", "")
        |  };
        |}
        |public Object[] getInlineOutputFieldValues(SeaTunnelRowAccessor row) {
        |  return new Object[] { ((String) row.getField(1)).toUpperCase() };
        |}
        |""".stripMargin
    val out = DynamicOp.applyCompiledJava(df, src)
    // exactly one name-ish column survives (the case-variant replacement)
    assert(out.columns.count(_.equalsIgnoreCase("name")) == 1, out.columns.mkString(","))
    // and resolving it is unambiguous under default case-insensitive rules
    val rows = out.select("id", "name").orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("A", "B"))
  }

  test("reference e2e single_dynamic_java_compile_transform.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark,
      load(confDir + "conf/single_dynamic_java_compile_transform.conf"))
    val out = catalog("fake1")
    assert(out.count() == 100)
    assert(out.select("col1").distinct().collect().map(_.getString(0)).toSeq == Seq("test1"))
  }

  test("reference e2e multiple_dynamic_java_compile_transform.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark,
      load(confDir + "conf/multiple_dynamic_java_compile_transform.conf"))
    val out = catalog("fake2")
    assert(out.select("col1").distinct().collect().map(_.getString(0)).toSeq == Seq("test1"))
    assert(out.select("col2").distinct().collect().map(_.getString(0)).toSeq == Seq("test2"))
  }

  test("reference e2e single_dynamic_java_compile_transform_compatible.conf runs verbatim " +
      "(legacy transform.common accessor import)") {
    val catalog = Pipeline.runHocon(spark,
      load(confDir + "conf/single_dynamic_java_compile_transform_compatible.conf"))
    assert(catalog("fake1").select("col1").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("test1"))
  }

  test("reference e2e single_java_path_compile.conf runs verbatim (ABSOLUTE_PATH source)") {
    // the reference IT copies its JavaFile fixture to /tmp inside the
    // container before running the config; mirror that setup
    Files.copy(Paths.get(confDir + "source_file/JavaFile"), Paths.get("/tmp/JavaFile"),
      StandardCopyOption.REPLACE_EXISTING)
    val catalog = Pipeline.runHocon(spark,
      load(confDir + "conf/single_java_path_compile.conf"))
    assert(catalog("fake1").select("col1").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("test1"))
  }

  test("reference e2e single_dynamic_java_compile_transform_multi_table.conf runs verbatim") {
    val catalog = Pipeline.runHocon(spark,
      load(confDir + "conf/single_dynamic_java_compile_transform_multi_table.conf"))
    assert(catalog.keys.exists(_.startsWith("test.")))
  }
}
