package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The graft-cdc DataSource V2 streaming source against embedded Derby:
  * hybrid first batch (snapshot splits + changelog window), exactly-once
  * changelog windows on later batches, checkpoint-restart resume with no
  * re-snapshot.
  */
class CdcMicroBatchSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftcdcv2;create=true"

  private def exec(sql: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    try sql.foreach(st.executeUpdate) finally { st.close(); conn.close() }
  }

  private def fresh(table: String, n: Int): Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    try {
      for (t <- Seq(s"CL_$table", table)) {
        try st.executeUpdate(s"DROP TABLE $t")
        catch { case _: java.sql.SQLException => () }
      }
      st.executeUpdate(
        s"CREATE TABLE $table (ID BIGINT NOT NULL PRIMARY KEY, NAME VARCHAR(40), SCORE DOUBLE)")
      val ps = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?)")
      (1 to n).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"name_$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch(); ps.close()
    } finally { st.close(); conn.close() }
  }

  private def stream(table: String): DataFrame =
    spark.readStream.format("graft-cdc")
      .option("url", url).option("table", table).option("pk", "ID")
      .option("chunkSize", "4")
      .load()

  test("first batch delivers the snapshot as +I seq-0 rows") {
    fresh("V1", 10)
    val q = stream("V1").writeStream.format("memory")
      .queryName("cdcv2_snap").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("cdcv2_snap")
      .select("ID", "CL_SEQ", graft.operators.RowKindOps.RowKindCol)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === 10)
    assert(rows.forall { case (_, seq, kind) => seq === 0L && kind === "+I" })
    assert(rows.map(_._1).sorted.toSeq === (1L to 10L))
  }

  test("later batches deliver changelog windows exactly once, kinds intact") {
    fresh("V2", 6)
    val q = stream("V2").writeStream.format("memory")
      .queryName("cdcv2_inc").outputMode("append").start()
    try {
      q.processAllAvailable()
      exec("UPDATE V2 SET NAME = 'renamed' WHERE ID = 2",
        "DELETE FROM V2 WHERE ID = 3",
        "INSERT INTO V2 VALUES (7, 'seven', 7.5)")
      q.processAllAvailable()
      // a second drain with no new changes must deliver nothing new
      q.processAllAvailable()
    } finally q.stop()
    val events = spark.table("cdcv2_inc").where(col("CL_SEQ") > 0)
      .select("ID", graft.operators.RowKindOps.RowKindCol, "CL_SEQ")
      .orderBy("CL_SEQ")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(events.toSeq === Seq((2L, "-U"), (2L, "+U"), (3L, "-D"), (7L, "+I")))
    // merge replay reconstructs the live table exactly (changes side is
    // rebuilt with fresh attribute ids — both branches come from the same
    // memory table and would otherwise self-conflict in the anti-join)
    val all = spark.table("cdcv2_inc")
    val changes = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(
        all.where(col("CL_SEQ") > 0).collect(): _*)), all.schema)
    val merged = graft.streaming.StreamingOps.applyCdcBatch(
      all.where(col("CL_SEQ") === 0).select("ID", "NAME", "SCORE"),
      changes, Seq("ID"), "CL_SEQ")
    val live = Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some("V2")))
    assert(merged.orderBy("ID").collect().map(_.toSeq).toSeq ===
      live.orderBy("ID").collect().map(_.toSeq).toSeq)
  }

  test("checkpoint restart resumes from the committed offset, no re-snapshot") {
    fresh("V3", 5)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcv2").toString
    CdcMicroBatchSpec.delivered.clear()
    def start() = stream("V3").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("ID", "CL_SEQ", graft.operators.RowKindOps.RowKindCol)
          .collect().foreach(r => CdcMicroBatchSpec.delivered.add(
            (r.getLong(0), r.getLong(1), r.getString(2))))
        ()
      }.start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(CdcMicroBatchSpec.delivered.size() === 5)
    exec("UPDATE V3 SET SCORE = 99.0 WHERE ID = 1")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // the restarted query delivers ONLY the new window (-U/+U for id 1) —
    // no second snapshot, no duplicated changelog rows
    val post = java.util.Collections.list(java.util.Collections.enumeration(
      CdcMicroBatchSpec.delivered)).toArray.toSeq
    assert(post.size === 7, post.toString)
    val newOnes = post.collect { case (id: Long, seq: Long, k: String) if seq > 0 => (id, k) }
    assert(newOnes.sorted === Seq((1L, "+U"), (1L, "-U")))
  }
}

object CdcMicroBatchSpec {
  val delivered = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
}
