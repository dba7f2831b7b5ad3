package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The normalized-ts predicate rewrite: filters on Tables.load's
  * epoch-nanos `ts` must reach the parquet scan as pushed filters on the
  * raw timestamp column (VERDICT r8 #8 — without the rule the
  * normalization projection blocks all row-group pruning on events).
  */
class TsPushdownSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def ns(iso: String): Long =
    java.time.Instant.parse(iso).getEpochSecond * 1000000000L

  private def events: DataFrame = Tables.load(spark, sfDir, "events")

  private def pushed(df: DataFrame): String = {
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    scan.linesIterator.find(_.contains("PushedFilters")).getOrElse(scan)
  }

  // the rewrite only has work to do when the file stores a timestamp type
  // (epoch-long storage needs no normalization and pushes natively)
  private val tsIsTimestamp = spark.read.parquet(s"$sfDir/events.parquet")
    .schema("ts").dataType.typeName.startsWith("timestamp")

  test("range predicate on normalized ts pushes to the parquet scan") {
    assume(tsIsTimestamp)
    val q = events.where(col("ts") >= ns("2024-01-10T00:00:00Z") &&
      col("ts") < ns("2024-01-20T00:00:00Z"))
    val p = pushed(q)
    assert(p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"),
      s"expected ts bounds in pushed filters, got: $p")
  }

  test("rewritten filter selects exactly the rows the long predicate selects") {
    val lo = ns("2024-01-08T07:00:00Z") + 1 // deliberately not a micro multiple
    val hi = ns("2024-01-23T17:30:00Z") + 999
    val expected = events.collect()
      .map(_.getAs[Long]("ts")).count(t => t >= lo && t < hi)
    val got = events.where(col("ts") >= lo && col("ts") < hi).count()
    assert(got === expected)
    // boundary exactness: >= / > / <= / < and = on an existing value
    val some = events.select("ts").orderBy("ts").limit(3).collect().map(_.getLong(0))
    val v = some(1)
    val all = events.collect().map(_.getAs[Long]("ts"))
    assert(events.where(col("ts") > v).count() === all.count(_ > v))
    assert(events.where(col("ts") >= v).count() === all.count(_ >= v))
    assert(events.where(col("ts") < v).count() === all.count(_ < v))
    assert(events.where(col("ts") <= v).count() === all.count(_ <= v))
    assert(events.where(col("ts") === v).count() === all.count(_ == v))
    // an off-grid equality (never a stored micro multiple) matches nothing
    assert(events.where(col("ts") === (v + 1)).count() === 0)
  }

  test("q_ts_prune plan carries ts bounds at the scan") {
    assume(tsIsTimestamp)
    val q = graft.SparkEntry.queries("q_ts_prune")(spark, sfDir)
    val p = pushed(q)
    assert(p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"),
      s"expected ts bounds in pushed filters, got: $p")
  }
}
