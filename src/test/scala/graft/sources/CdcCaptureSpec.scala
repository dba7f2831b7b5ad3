package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingOps

/** CDC source capture against embedded Derby: trigger changelog, chunked
  * snapshot splits, watermark reconciliation, offset-resumed stream phase.
  */
class CdcCaptureSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftcdc;create=true"

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
        catch { case _: java.sql.SQLException => () } // absent on first run
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

  private def tableNow(table: String) =
    Jdbc.read(spark, Jdbc.JdbcSourceConfig(url, table = Some(table)))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select($"ID", $"NAME", $"SCORE").orderBy("ID").collect().toSeq

  test("changelog triggers record row kinds in seq order, -U before +U") {
    fresh("T1", 3)
    CdcCapture.installChangelog(url, "T1")
    CdcCapture.installChangelog(url, "T1") // idempotent
    exec(
      "INSERT INTO T1 VALUES (10, 'ten', 10.0)",
      "UPDATE T1 SET SCORE = 99.0 WHERE ID <= 2",
      "DELETE FROM T1 WHERE ID = 3")
    val cl = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "CL_T1").load()
      .orderBy("CL_SEQ").select(trim($"CL_OP"), $"ID").as[(String, Long)].collect().toSeq
    assert(cl.head == ("+I", 10L))
    // one multi-row UPDATE: both -U images before both +U images (trigger
    // creation order), so latest-by-seq per key is always the new image
    assert(cl.slice(1, 5).map(_._1) == Seq("-U", "-U", "+U", "+U"))
    assert(cl.slice(1, 3).map(_._2).sorted == Seq(1L, 2L))
    assert(cl.last == ("-D", 3L))
  }

  test("snapshot splits cover the table, one spark partition per chunk") {
    fresh("T2", 50)
    val splits = CdcCapture.planSplits(url, "T2", "ID", chunkSize = 10)
    assert(splits.size == 5)
    assert(splits.last.hi.isEmpty) // open tail split
    val df = CdcCapture.readSplits(spark, url, "T2", "ID", splits)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == 50)
    assert(df.select(countDistinct($"ID")).as[Long].head() == 50)
  }

  test("snapshot reconciles changes landing inside the watermark window") {
    fresh("T3", 40)
    CdcCapture.installChangelog(url, "T3")
    // writes arriving between the low watermark and the chunk reads: they
    // are visible in the chunks AND in the (low, high] window — the
    // set-wise replay must be idempotent, and the result as-of high
    val (snap, state) = CdcCapture.snapshot(spark, url, "T3", "ID", chunkSize = 10,
      beforeRead = () => exec(
        "INSERT INTO T3 VALUES (100, 'new', 1.0)",
        "UPDATE T3 SET NAME = 'upd' WHERE ID <= 5",
        "DELETE FROM T3 WHERE ID = 40"))
    assert(state.streamOffset > 0) // the window was non-empty
    assert(sortedRows(snap) == sortedRows(tableNow("T3")))
    assert(snap.where($"NAME" === "upd").count() == 5)
    assert(snap.count() == 40) // 40 - 1 deleted + 1 inserted
  }

  test("stream phase is exactly-once across polls and a state-file restart") {
    fresh("T4", 20)
    CdcCapture.installChangelog(url, "T4")
    val (snap, s0) = CdcCapture.snapshot(spark, url, "T4", "ID", chunkSize = 8)
    assert(sortedRows(snap) == sortedRows(tableNow("T4")))

    // batch A
    exec("INSERT INTO T4 VALUES (21, 'a', 2.0)", "UPDATE T4 SET SCORE = 0.5 WHERE ID = 1")
    val (batchA, s1) = CdcCapture.changesSince(spark, url, s0)
    assert(batchA.agg(min($"CL_SEQ")).as[Long].head() > s0.streamOffset) // no replay
    val afterA = StreamingOps.applyCdcBatch(snap, batchA, Seq("ID"), "CL_SEQ")
    assert(sortedRows(afterA) == sortedRows(tableNow("T4")))

    // state survives a restart via the properties file
    val stateFile = java.nio.file.Files.createTempFile("cdcstate", ".properties").toString
    s1.save(stateFile)
    val restored = CdcCapture.CaptureState.load(stateFile)
    assert(restored == s1)

    // batch B after the "restart": only B's events, none of A's
    exec("DELETE FROM T4 WHERE ID = 2", "INSERT INTO T4 VALUES (22, 'b', 3.0)")
    val (batchB, s2) = CdcCapture.changesSince(spark, url, restored)
    assert(batchB.count() == 2)
    assert(batchB.agg(min($"CL_SEQ")).as[Long].head() > s1.streamOffset)
    val afterB = StreamingOps.applyCdcBatch(afterA, batchB, Seq("ID"), "CL_SEQ")
    assert(sortedRows(afterB) == sortedRows(tableNow("T4")))

    // an idle poll delivers nothing and holds the offset
    val (empty, s3) = CdcCapture.changesSince(spark, url, s2)
    assert(empty.count() == 0 && s3.streamOffset == s2.streamOffset)
  }

  test("split-level resume: pending splits from saved state complete the snapshot") {
    fresh("T5", 30)
    val splits = CdcCapture.planSplits(url, "T5", "ID", chunkSize = 10)
    assert(splits.size == 3)
    val (done, pending) = splits.splitAt(1)
    val part1 = CdcCapture.readSplits(spark, url, "T5", "ID", done)
    // crash: persist progress, restart from the state file
    val stateFile = java.nio.file.Files.createTempFile("cdcsplits", ".properties").toString
    CdcCapture.CaptureState("T5", "ID", pending, 0L).save(stateFile)
    val restored = CdcCapture.CaptureState.load(stateFile)
    assert(restored.pendingSplits == pending)
    val part2 = CdcCapture.readSplits(spark, url, "T5", "ID", restored.pendingSplits)
    assert(part1.count() + part2.count() == 30)
    assert(part1.unionByName(part2).select(countDistinct($"ID")).as[Long].head() == 30)
  }

  test("durable materialization: snapshot chunks land in parquet") {
    fresh("T6", 12)
    CdcCapture.installChangelog(url, "T6")
    val dir = java.nio.file.Files.createTempDirectory("cdcsnap").toString + "/chunks"
    val (snap, _) = CdcCapture.snapshot(spark, url, "T6", "ID", chunkSize = 5,
      materializeDir = Some(dir))
    assert(sortedRows(snap) == sortedRows(tableNow("T6")))
    assert(new java.io.File(dir, "_SUCCESS").exists())
  }
}
