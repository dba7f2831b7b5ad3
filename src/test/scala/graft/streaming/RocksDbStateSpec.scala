package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** RocksDB state-store correctness pin.
  *
  * The production state store for stateful streams whose state exceeds
  * executor heap is RocksDB (off-heap, on-disk) — exactly the failure
  * mode the r18 sf10 gate abort measured on the default in-heap
  * HDFSBackedStateStore at an 8 GB heap. The knob has been turned for
  * PERFORMANCE before (SCALE_r16.json `streaming_sf10_rocksdb`
  * adjudicated it 1.77x slower than in-heap at this single-JVM scale,
  * which is why it is not the local default), but the suite carried no
  * CORRECTNESS coverage: nothing pinned that the provider loads its
  * native library here and produces bit-identical results. These tests
  * pin both, on two representative stateful operators, against the same
  * fixtures and expectations as the default-provider tests in the
  * sibling StreamingOpsSpec.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Key = "spark.sql.streaming.stateStore.providerClass"

  /** Run `body` with the RocksDB provider pinned; restore after. The
    * provider is read at query START, so setting it per-test is exactly
    * how a production job config would select it.
    */
  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, Rocks)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }

  private val H = 3600L * 1000000000L // one hour in ns

  test("windowedAgg under the RocksDB state store matches the default-provider result") {
    implicit val sq = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[Evt]
      val events = StreamingOps.withEventTime(input.toDF(), "tsNs", "et")
      val agg = StreamingOps.windowedAgg(events, "et", "1 hour",
        Seq(count(lit(1)).as("n"), sum("v").as("sv")), keys = Seq("k"))
      val q = agg.writeStream.format("memory").queryName("winagg_rocks")
        .outputMode("update").start()
      try {
        input.addData(Evt("a", 100, 1.0), Evt("a", 200, 2.0),
          Evt("a", H + 100, 5.0), Evt("b", 150, 7.0))
        q.processAllAvailable()
        assert(q.exception.isEmpty, s"RocksDB-backed query failed: ${q.exception}")
        val rows = spark.table("winagg_rocks")
          .select(col("window.start").cast("long").as("ws"), col("k"), col("n"), col("sv"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
        // same fixture and expectation as StreamingOpsSpec's default-provider test
        assert(rows == Set((0L, "a", 2L, 3.0), (3600L, "a", 1L, 5.0), (0L, "b", 1L, 7.0)))
      } finally q.stop()
    }
  }

  test("streamingDedup under the RocksDB state store matches the default-provider result") {
    implicit val sq = spark.sqlContext
    withRocksDb {
      val T0 = 1704067200L * 1000000000L
      val input = MemoryStream[Evt]
      val deduped = StreamingOps.streamingDedup(
        StreamingOps.withEventTime(input.toDF(), "tsNs", "et"), Seq("k"), "et", "1 second")
      val q = deduped.writeStream.format("memory").queryName("dedupst_rocks")
        .outputMode("append").start()
      try {
        input.addData(Evt("x", T0, 1.0), Evt("x", T0 + 1000000L, 2.0), Evt("y", T0, 3.0))
        q.processAllAvailable()
        input.addData(Evt("z", T0 + 600L * 1000000000L, 4.0))
        q.processAllAvailable()
        assert(q.exception.isEmpty, s"RocksDB-backed query failed: ${q.exception}")
        val rows = spark.table("dedupst_rocks").select("k", "v").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1)
        assert(rows.toSeq == Seq("x" -> 1.0, "y" -> 3.0, "z" -> 4.0))
      } finally q.stop()
    }
  }
}
