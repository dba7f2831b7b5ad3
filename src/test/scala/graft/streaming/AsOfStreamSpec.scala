package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class AsOfRaw(key: Long, tsNs: Long, side: Int, id: Long, value: Double)

/** Streaming as-of join: watermark-buffered temporal enrichment with
  * late-arriving dimension updates (the scenario a per-batch join gets
  * wrong).
  */
class AsOfStreamSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // one second in ns
  private val T0 = 1704067200L * S // 2024-01-01

  private def rows(table: String): Set[(Long, Long, Option[Long], Option[Double])] =
    spark.table(table)
      .select("key", "id", "rTsNs", "rValue").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

  private def awaitRows(q: org.apache.spark.sql.streaming.StreamingQuery,
      table: String, n: Int): Unit = {
    q.processAllAvailable()
    val deadline = System.currentTimeMillis() + 30000
    while (spark.table(table).count() < n && System.currentTimeMillis() < deadline) {
      Thread.sleep(100); q.processAllAvailable()
    }
  }

  test("late-arriving dimension update lands on buffered events; idle keys flush by timeout") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[AsOfRaw]
    val out = StreamingOps.asOfStream(input.toDF(), watermarkDelay = "60 seconds")
    val q = out.writeStream.format("memory").queryName("asof1")
      .outputMode("append").start()
    try {
      // batch 1: left at T0+100s, dimension v1 at T0+50s — nothing flushes
      // (watermark still behind the left)
      input.addData(
        AsOfRaw(1L, T0 + 100 * S, 1, 10L, 0.0),
        AsOfRaw(1L, T0 + 50 * S, 0, 0L, 1.0))
      q.processAllAvailable()
      assert(spark.table("asof1").count() === 0,
        "left must buffer until the watermark passes it")
      // batch 2: a LATE dimension v2 at T0+90s (within the 60s delay) plus
      // a far-future row on another key that advances the global watermark
      input.addData(
        AsOfRaw(1L, T0 + 90 * S, 0, 0L, 2.0),
        AsOfRaw(99L, T0 + 100000 * S, 0, 0L, 0.0))
      awaitRows(q, "asof1", 1)
      // the buffered left matches the LATE v2 (ts 90 <= 100), not stale v1
      assert(rows("asof1") === Set((1L, 10L, Some(T0 + 90 * S), Some(2.0))))
    } finally q.stop()
  }

  test("left-outer: no dimension yet -> null match; tolerance nulls stale versions") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[AsOfRaw]
    val out = StreamingOps.asOfStream(input.toDF(), watermarkDelay = "10 seconds",
      toleranceNs = Some(30 * S))
    val q = out.writeStream.format("memory").queryName("asof2")
      .outputMode("append").start()
    try {
      input.addData(
        AsOfRaw(1L, T0 + 100 * S, 1, 10L, 0.0), // no dimension for key 1
        AsOfRaw(2L, T0 + 5 * S, 0, 0L, 7.0),    // dimension 45s before the left
        AsOfRaw(2L, T0 + 50 * S, 1, 20L, 0.0),  // stale beyond 30s tolerance
        AsOfRaw(2L, T0 + 90 * S, 0, 0L, 8.0),   // fresh version for the next
        AsOfRaw(2L, T0 + 110 * S, 1, 21L, 0.0), // matches 8.0 within 30s
        AsOfRaw(99L, T0 + 100000 * S, 0, 0L, 0.0)) // watermark mover
      awaitRows(q, "asof2", 3)
      assert(rows("asof2") === Set(
        (1L, 10L, None, None),
        (2L, 20L, None, None), // match exists (7.0) but 45s stale -> nulled
        (2L, 21L, Some(T0 + 90 * S), Some(8.0))))
    } finally q.stop()
  }

  test("dimension versions before the watermark collapse to the single latest (bounded state)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[AsOfRaw]
    val out = StreamingOps.asOfStream(input.toDF(), watermarkDelay = "10 seconds")
    val q = out.writeStream.format("memory").queryName("asof3")
      .outputMode("append").start()
    try {
      // many old versions, then (after the watermark passed them) a left:
      // the match must be the latest pre-watermark version
      input.addData(
        AsOfRaw(1L, T0 + 10 * S, 0, 0L, 1.0),
        AsOfRaw(1L, T0 + 20 * S, 0, 0L, 2.0),
        AsOfRaw(1L, T0 + 30 * S, 0, 0L, 3.0),
        AsOfRaw(1L, T0 + 500 * S, 0, 0L, 99.0)) // watermark to ~490s
      q.processAllAvailable()
      input.addData(
        AsOfRaw(1L, T0 + 495 * S, 1, 30L, 0.0), // after pruning: matches 3.0
        AsOfRaw(99L, T0 + 100000 * S, 0, 0L, 0.0))
      awaitRows(q, "asof3", 1)
      assert(rows("asof3") === Set((1L, 30L, Some(T0 + 30 * S), Some(3.0))))
    } finally q.stop()
  }
}
