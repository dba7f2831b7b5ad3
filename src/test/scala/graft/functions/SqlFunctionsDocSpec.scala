package graft.functions

import graft.SparkSpec

/** Runs the reference's documented SQL-function examples verbatim
  * (docs/en/transform-v2/sql-functions.md) to catch argument-order and
  * semantic drift. Concrete doc examples are asserted exactly; examples
  * over symbolic columns (NAME, CREATED, ...) are bound to a fixture row.
  */
class SqlFunctionsDocSpec extends SparkSpec {

  private def one(sql: String): Any = {
    ZetaFunctions.register(spark)
    spark.sql(s"SELECT $sql AS v").collect()(0).get(0)
  }

  private lazy val fixture: Unit = {
    import spark.implicits._
    Seq(("John.Doe", "2021-04-08 13:34:45"))
      .toDF("NAME", "created_s")
      .selectExpr("NAME", "CAST(created_s AS TIMESTAMP) AS CREATED")
      .createOrReplaceTempView("t")
    ()
  }

  private def oneT(sql: String): Any = {
    fixture
    ZetaFunctions.register(spark)
    spark.sql(s"SELECT $sql AS v FROM t").collect()(0).get(0)
  }

  test("string function doc examples") {
    assert(one("ASCII('Hi')") == 72)
    assert(one("CHAR_LENGTH('Hi')") == 2)
    assert(one("CHAR(65)") == "A")
    assert(one("CONCAT('a', NULL, 'b')") == "ab") // NULL params ignored
    assert(one("CONCAT_WS(',', 'a', NULL, 'b')") == "a,b")
    assert(one("RAWTOHEX('A')") == "0041") // 4 hex chars per character
    assert(one("HEXTORAW('0041')") == "A")
    assert(one("INSERT_STR('Hello', 1, 1, ' ')") == " ello")
    assert(one("LOWER('Hello')") == "hello" && one("UPPER('Hello')") == "HELLO")
    assert(one("LEFT('Hello', 3)") == "Hel" && one("RIGHT('Hello', 3)") == "llo")
    assert(oneT("LOCATE('.', NAME)") == 5)
    assert(oneT("INSTR(NAME, '.')") == 5)
    assert(oneT("POSITION('.', NAME)") == 5)
    assert(one("LPAD('7', 3, '0')") == "007" && one("RPAD('7', 3, '0')") == "700")
    assert(one("TRIM('  x  ')") == "x")
    assert(one("REPEAT('ab', 2)") == "abab")
    assert(one("REPLACE('Hello', 'l', 'L')") == "HeLLo")
    assert(one("SOUNDEX('Robert')") == "R163")
    assert(one("SPACE(3)") == "   ")
    assert(one("SUBSTRING('Hello', 2, 3)") == "ell")
    assert(one("TRANSLATE('Hello world', 'eo', 'EO')") == "HEllO wOrld")
  }

  test("regexp doc examples incl H2 flags") {
    assert(one("REGEXP_REPLACE('Hello    World', ' +', ' ')") == "Hello World")
    // doc example: 'i' flag — case-insensitive collapse of WWWW -> W
    assert(one("REGEXP_REPLACE('Hello WWWWorld', 'w+', 'W', 'i')") == "Hello World")
    assert(one("REGEXP_LIKE('Hello    World', '[A-Z ]*', 'i')") == true)
    assert(one("REGEXP_LIKE('hello', 'HELLO', 'i')") == true)
    assert(one("REGEXP_LIKE('hello', 'HELLO', 'ic')") == false) // later flag wins
    assert(one("REGEXP_SUBSTR('2020-10-01', '\\\\d{4}')") == "2020")
    assert(one("REGEXP_SUBSTR('2020-10-01', '(\\\\d{4})-(\\\\d{2})-(\\\\d{2})', 1, 1, NULL, 2)") == "10")
    assert(one("REGEXP_SUBSTR('no-digits', '\\\\d{4}')") == null)
  }

  test("numeric function doc examples") {
    assert(one("ABS(-3)") == 3)
    assert(one("MOD(10, 3)") == 1)
    assert(one("CEIL(1.2E0)") == 2L && one("FLOOR(1.8E0)") == 1L)
    assert(one("LOG(2, 8)") == 3.0) // H2: LOG(base, x)
    assert(one("LOG10(1000)") == 3.0)
    assert(one("LN(EXP(1.0))") == 1.0)
    assert(one("SQRT(16)") == 4.0)
    assert(one("POWER(2, 10)") == 1024.0)
    assert(one("SIGN(-5)") == -1.0 || one("SIGN(-5)") == -1)
    assert(one("ROUND(2.55, 1)").toString.toDouble == 2.6)
    assert(one("TRUNC(2.59, 1)") == 2.5)  // doc: TRUNC(N, 2) numeric
    assert(one("TRUNC(-2.59, 1)") == -2.5) // toward zero
    assert(one("TRUNCATE(123.456, 2)") == 123.45)
    assert(one("PI()").asInstanceOf[Double] == math.Pi)
    assert(one("RADIANS(180.0)").asInstanceOf[Double] == math.Pi)
    val r = one("RAND()").asInstanceOf[Double]
    assert(r >= 0.0 && r < 1.0)
  }

  test("date/time function doc examples (zeta argument order)") {
    assert(oneT("DATEADD(CREATED, 1, 'MONTH')").toString.startsWith("2021-05-08 13:34:45"))
    assert(oneT("TIMESTAMPADD(CREATED, 1, 'MONTH')").toString.startsWith("2021-05-08"))
    assert(oneT("DATEADD(CREATED, -1, 'DAY')").toString.startsWith("2021-04-07"))
    // DATEDIFF(a, b, unit) = b - a, reference arg order
    assert(oneT("DATEDIFF(CREATED, TIMESTAMP '2021-04-18 00:00:00', 'DAY')") == 10L)
    assert(oneT("DATEDIFF(CREATED, TIMESTAMP '2022-06-08 00:00:00', 'MONTH')") == 2L)
    // 2-arg form stays Spark-native (end - start in days)
    assert(one("DATEDIFF(DATE '2021-04-18', DATE '2021-04-08')") == 10)
    assert(oneT("DATE_TRUNC('DAY', CREATED)").toString.startsWith("2021-04-08 00:00:00"))
    assert(oneT("DAYNAME(CREATED)") == "Thursday")
    assert(oneT("MONTHNAME(CREATED)") == "April")
    assert(oneT("DAY_OF_MONTH(CREATED)") == 8)
    assert(oneT("DAY_OF_WEEK(CREATED)") == 5) // H2: Sunday=1..Saturday=7
    assert(oneT("DAY_OF_YEAR(CREATED)") == 98)
    assert(oneT("EXTRACT(YEAR FROM CREATED)") == 2021)
    assert(oneT("FORMATDATETIME(CREATED, 'yyyy-MM-dd HH:mm:ss')") == "2021-04-08 13:34:45")
    assert(oneT("HOUR(CREATED)") == 13 && oneT("MINUTE(CREATED)") == 34)
    assert(oneT("SECOND(CREATED)") == 45)
    assert(oneT("MONTH(CREATED)") == 4 && oneT("QUARTER(CREATED)") == 2)
    assert(oneT("WEEK(CREATED)") == 14)
    assert(oneT("YEAR(CREATED)") == 2021)
    assert(one("IS_DATE('2021-04-08 13:34:45','yyyy-MM-dd HH:mm:ss')") == true)
    assert(one("IS_DATE('not a date','yyyy-MM-dd')") == false)
    assert(one("PARSEDATETIME('2021-04-08 13:34:45','yyyy-MM-dd HH:mm:ss')")
      .toString.startsWith("2021-04-08 13:34:45"))
    // doc examples: FROM_UNIXTIME with and without explicit zone
    assert(one("FROM_UNIXTIME(1672502400, 'yyyy-MM-dd HH:mm:ss')") == "2022-12-31 16:00:00") // UTC session
    assert(one("FROM_UNIXTIME(1672502400, 'yyyy-MM-dd HH:mm:ss','UTC+6')") == "2022-12-31 22:00:00")
  }

  test("system function doc examples") {
    assert(one("CAST(65 AS STRING)") == "65")
    assert(one("COALESCE(NULL, 'b')") == "b")
    assert(one("IFNULL(NULL, 'x')") == "x")
    assert(one("NULLIF('a', 'a')") == null)
    assert(one("CASE WHEN 1 = 1 THEN 'y' ELSE 'n' END") == "y")
    assert(one("UUID()").toString.length == 36)
  }

  test("array + lateral view doc examples") {
    import scala.jdk.CollectionConverters._
    val arr = one("ARRAY(1,2,3)")
    assert(arr.asInstanceOf[scala.collection.Seq[Any]].toSeq == Seq(1, 2, 3))
    fixture
    val rows = spark.sql(
      "SELECT * FROM t LATERAL VIEW EXPLODE(SPLIT(NAME, '\\\\.')) AS part").collect()
    assert(rows.map(_.getAs[String]("part")).toSeq == Seq("John", "Doe"))
    val outer = spark.sql(
      "SELECT * FROM t LATERAL VIEW OUTER EXPLODE(ARRAY()) AS x").collect()
    assert(outer.length == 1 && outer(0).isNullAt(outer(0).fieldIndex("x")))
  }
}
