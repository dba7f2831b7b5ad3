package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session, specs run in
  * the forked test JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.datetime.java8API.enabled", "false")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  // the test harness opts into test-only plugins (InMemory failure
  // injection) the way the reference confines them to its e2e jars
  sys.props("graft.test.sinks") = "true"

  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
