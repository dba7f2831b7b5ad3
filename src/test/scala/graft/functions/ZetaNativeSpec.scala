package graft.functions

import graft.SparkSpec

/** The zeta scalar leaves converted to native expressions (r8): plan shape
  * (no ScalaUDF) + value parity with the original UDF implementations,
  * evaluated over a real projection so the generated code actually runs.
  */
class ZetaNativeSpec extends SparkSpec {
  import spark.implicits._

  ZetaFunctions.register(spark)

  private def df = Seq(
    (1L, "48656c6c6f".take(8), "2024-01-15 10:30:45", 3.14159, "2024-03-02"),
    (2L, "00410042", "1999-12-31 23:59:59", -2.71828, "1999-02-28")
  ).toDF("id", "hex", "tstr", "x", "dstr")
    .selectExpr("id", "hex", "CAST(tstr AS TIMESTAMP) AS ts", "x", "dstr")

  test("native zeta expressions keep ScalaUDF out of the plan") {
    val q = df.selectExpr(
      "hextoraw(rawtohex(hex)) AS roundtrip", "truncate(x, 2) AS tr",
      "dayname(ts) AS dn", "monthname(ts) AS mn", "week(ts) AS w",
      "formatdatetime(ts, 'yyyy-MM-dd HH:mm') AS f",
      "parsedatetime(dstr, 'yyyy-MM-dd') AS p",
      "is_date(dstr, 'yyyy-MM-dd') AS ok",
      "dateadd(ts, 3, 'DAY') AS da", "zeta_datediff(ts, ts, 'DAY') AS dd",
      "day_of_month(ts) AS dom", "day_of_year(ts) AS doy", "day_of_week(ts) AS dow",
      "zeta_mod(13.0, 5.4) AS zm", "to_char_num(x) AS tc")
    assert(!q.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    val r = q.orderBy("roundtrip").collect()
    assert(r.length == 2)
  }

  test("native values match the original scalar implementations") {
    val row = df.where($"id" === 1).selectExpr(
      "rawtohex(hex) AS rh", "truncate(x, 2) AS tr", "dayname(ts) AS dn",
      "monthname(ts) AS mn", "week(ts) AS w",
      "formatdatetime(ts, 'yyyy-MM-dd HH:mm') AS f",
      "day_of_week(ts) AS dow", "zeta_mod(13.0, 5.4) AS zm").head()
    assert(row.getAs[String]("rh") == ZetaFunctions.rawtohex("48656c6c"))
    assert(row.getAs[Double]("tr") == ZetaFunctions.truncate(3.14159, 2))
    assert(row.getAs[String]("dn") == "Monday") // 2024-01-15
    assert(row.getAs[String]("mn") == "January")
    assert(row.getAs[Int]("w") == 3)
    assert(row.getAs[String]("f") == "2024-01-15 10:30")
    assert(row.getAs[Int]("dow") == 2) // H2: Sunday=1 -> Monday=2
    assert(row.getAs[Double]("zm") == 2.2) // BigDecimal-exact, not fmod
  }

  test("null propagation matches the UDF behavior") {
    val r = spark.sql(
      """SELECT hextoraw(CAST(NULL AS STRING)) a, dayname(CAST(NULL AS TIMESTAMP)) b,
        |truncate(CAST(NULL AS DOUBLE), 2) c,
        |formatdatetime(CAST(NULL AS TIMESTAMP), 'yyyy') d,
        |zeta_datediff(CAST(NULL AS TIMESTAMP), current_timestamp, 'DAY') e""".stripMargin).head()
    (0 until 5).foreach(i => assert(r.isNullAt(i)))
  }
}
