package graft.sources

import java.sql.DriverManager

import graft.SparkSpec

/** Exercises the JDBC connector against the embedded Derby that ships on
  * the Spark classpath (jdbc:derby:memory: — in-process, shared across
  * local-mode executor threads).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate("CREATE TABLE people (id BIGINT NOT NULL, name VARCHAR(40), score DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO people VALUES (?, ?, ?)")
    (1 to 100).foreach { i =>
      ps.setLong(1, i.toLong); ps.setString(2, s"name_$i"); ps.setDouble(3, i * 1.5)
      ps.addBatch()
    }
    ps.executeBatch()
    st.close(); conn.close()
    ()
  }

  test("reads a table, pushes predicates down to the database") {
    seeded
    val df = Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some("people")))
    assert(df.count() == 100)
    val filtered = df.where($"id" <= 10)
    assert(filtered.count() == 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual"))
  }

  test("partitioned read fans out to parallel range queries") {
    seeded
    val df = Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some("people"),
      partitionColumn = Some("id"), numPartitions = Some(4),
      lowerBound = Some(1L), upperBound = Some(101L)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
  }

  test("query-form read and sink round trip") {
    seeded
    val top = Jdbc.read(spark, Jdbc.JdbcSourceConfig(url,
      query = Some("SELECT id, name FROM people WHERE id <= 5")))
    assert(top.count() == 5)
    Jdbc.write(top, Jdbc.JdbcSinkConfig(url, table = "people_top", mode = "overwrite"))
    val back = Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some("people_top")))
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq == (1L to 5L))
  }

  test("Jdbc works as Pipeline source and sink plugins") {
    seeded
    val cfg =
      s"""{
         |  "source": [{"plugin": "Jdbc", "plugin_output": "p",
         |              "url": "$url", "table": "people"}],
         |  "transform": [{"plugin": "Sql", "plugin_input": "p", "plugin_output": "top",
         |                 "query": "SELECT id, name FROM p WHERE id <= 3"}],
         |  "sink": [{"plugin": "Jdbc", "plugin_input": "top",
         |            "url": "$url", "table": "people_pipe", "save_mode": "overwrite"}]
         |}""".stripMargin
    graft.api.Pipeline.runJson(spark, cfg)
    val back = Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some("people_pipe")))
    assert(back.count() == 3)
  }

  test("config validation rejects bad combinations") {
    intercept[IllegalArgumentException] {
      Jdbc.JdbcSourceConfig(url) // neither table nor query
    }
    intercept[IllegalArgumentException] {
      Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some("people"),
        partitionColumn = Some("id"), numPartitions = Some(4))) // no bounds
    }
  }
}
