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
      // triggers -> CL -> table: Derby refuses to drop CL while the base
      // table's triggers reference it, so a tables-only drop leaves a
      // stale CL and the next installChangelog no-ops (no capture)
      CdcCapture.reset(url, table)
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

  test("reset + reinstall re-arms capture (stale-CL regression)") {
    // the failure shape this guards: dropping only the TABLES leaves CL_T
    // in place (Derby X0Y25 — the base table's triggers depend on it),
    // installChangelog no-ops on the existing CL, and the re-created
    // table captures NOTHING. Driver-bench rep 2+ of the Derby-backed
    // queries returned snapshot-only results this way (r12).
    fresh("TRST", 3)
    CdcCapture.installChangelog(url, "TRST")
    exec("UPDATE TRST SET SCORE = 1.0 WHERE ID = 1")
    // full fixture reset, as a query re-run does it
    fresh("TRST", 3)
    CdcCapture.installChangelog(url, "TRST")
    exec("INSERT INTO TRST VALUES (10, 'ten', 10.0)",
      "DELETE FROM TRST WHERE ID = 2")
    val cl = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "CL_TRST").load()
      .orderBy("CL_SEQ").select(trim($"CL_OP"), $"ID").as[(String, Long)].collect().toSeq
    // only the post-reset mutations, captured from CL_SEQ 1
    assert(cl == Seq(("+I", 10L), ("-D", 2L)))
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

  test("auto splitter: pathologically skewed sparse PK takes the sampling path, exact coverage") {
    // ids 1..60 plus 1e9..1e9+59: distribution factor ~8.3e6 >> upper
    // bound, so evenly-spaced bounds would put all rows in 2 of thousands
    // of chunks; with the shard count over the threshold the splitter
    // samples every rate-th row and cuts at sample quantiles instead
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    try {
      try st.executeUpdate("DROP TABLE T7") catch { case _: java.sql.SQLException => () }
      st.executeUpdate("CREATE TABLE T7 (ID BIGINT NOT NULL PRIMARY KEY, NAME VARCHAR(40))")
      val ps = conn.prepareStatement("INSERT INTO T7 VALUES (?, ?)")
      ((1L to 60L) ++ (1000000000L to 1000000059L)).foreach { i =>
        ps.setLong(1, i); ps.setString(2, s"n$i"); ps.addBatch()
      }
      ps.executeBatch(); ps.close()
    } finally { st.close(); conn.close() }
    val cfg = CdcCapture.SplitterConfig(chunkSize = 10,
      sampleShardingThreshold = 4, inverseSamplingRate = 5)
    val splits = CdcCapture.planSplitsAuto(url, "T7", "ID", cfg)
    assert(splits.size > 2, s"sampling path should cut multiple shards, got $splits")
    assert(splits.head.lo.isEmpty && splits.last.hi.isEmpty)
    val df = CdcCapture.readSplits(spark, url, "T7", "ID", splits)
    assert(df.count() == 120)
    assert(df.select(countDistinct($"ID")).as[Long].head() == 120)
    // quantile bounds adapt to the skew: no shard holds the majority
    val perSplit = splits.map(s => spark.read.format("jdbc").option("url", url)
      .option("query", s"SELECT COUNT(*) N FROM T7 WHERE ${s.predicate("ID")}")
      .load().as[Long].head())
    assert(perSplit.sum == 120)
    assert(perSplit.max <= 60, s"a shard swallowed the skew: $perSplit")
  }

  test("auto splitter: small skewed PK walks unevenly-sized chunks of ~chunkSize rows") {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    try {
      try st.executeUpdate("DROP TABLE T8") catch { case _: java.sql.SQLException => () }
      st.executeUpdate("CREATE TABLE T8 (ID BIGINT NOT NULL PRIMARY KEY, NAME VARCHAR(40))")
      val ps = conn.prepareStatement("INSERT INTO T8 VALUES (?, ?)")
      ((1L to 20L) ++ (500000L to 500019L)).foreach { i =>
        ps.setLong(1, i); ps.setString(2, s"n$i"); ps.addBatch()
      }
      ps.executeBatch(); ps.close()
    } finally { st.close(); conn.close() }
    // shardCount (4) <= threshold (default 1000) -> next-chunk-max walk
    val splits = CdcCapture.planSplitsAuto(url, "T8", "ID",
      CdcCapture.SplitterConfig(chunkSize = 10))
    val df = CdcCapture.readSplits(spark, url, "T8", "ID", splits)
    assert(df.count() == 40)
    assert(df.select(countDistinct($"ID")).as[Long].head() == 40)
    // the walk guarantees ~chunkSize rows per chunk regardless of key gaps
    val perSplit = splits.map(s => spark.read.format("jdbc").option("url", url)
      .option("query", s"SELECT COUNT(*) N FROM T8 WHERE ${s.predicate("ID")}")
      .load().as[Long].head())
    assert(perSplit.sum == 40)
    assert(perSplit.forall(_ <= 11), s"uneven walk must bound chunk rows: $perSplit")
  }

  test("auto splitter: character PK splits with quoted bounds, exact coverage") {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    try {
      try st.executeUpdate("DROP TABLE T9") catch { case _: java.sql.SQLException => () }
      st.executeUpdate("CREATE TABLE T9 (CODE VARCHAR(20) NOT NULL PRIMARY KEY, NAME VARCHAR(40))")
      val ps = conn.prepareStatement("INSERT INTO T9 VALUES (?, ?)")
      (1 to 37).foreach { i =>
        ps.setString(1, f"key_$i%03d"); ps.setString(2, s"n$i"); ps.addBatch()
      }
      ps.executeBatch(); ps.close()
    } finally { st.close(); conn.close() }
    val splits = CdcCapture.planSplitsAuto(url, "T9", "CODE",
      CdcCapture.SplitterConfig(chunkSize = 10))
    assert(splits.size >= 3)
    assert(splits.forall(_.quoted))
    val df = CdcCapture.readSplits(spark, url, "T9", "CODE", splits)
    assert(df.count() == 37)
    assert(df.select(countDistinct($"CODE")).as[Long].head() == 37)
  }

  test("captureStream: snapshot then incremental in one streaming job, restart resumes") {
    fresh("TA", 15)
    CdcCapture.installChangelog(url, "TA")
    val statePath = java.nio.file.Files.createTempDirectory("cdcstream")
      .resolve("state.properties").toString
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[(String, Long)])]()
    def collectBatch(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      delivered.add((id, df.select(trim(col("__row_kind")), $"ID")
        .as[(String, Long)].collect().toSeq))
    def waitFor(cond: => Boolean, ms: Long = 30000): Unit = {
      val deadline = System.currentTimeMillis() + ms
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(150)
      assert(cond, "captureStream did not deliver within the deadline")
    }
    val q = CdcCapture.captureStream(spark, url, "TA", "ID", chunkSize = 6,
      statePath, collectBatch, pollsPerSecond = 10.0)
    try {
      waitFor(delivered.size() >= 1)
      val (snapId, snapRows) = delivered.poll()
      assert(snapId == -1L)
      assert(snapRows.map(_._2).sorted == (1L to 15L) && snapRows.forall(_._1 == "+I"))
      // incremental phase: the SAME running job delivers the change window
      exec("INSERT INTO TA VALUES (16, 'x', 1.0)", "DELETE FROM TA WHERE ID = 2")
      waitFor(!delivered.isEmpty)
      val events = Iterator.continually(delivered.poll()).takeWhile(_ != null)
        .flatMap(_._2).toSeq
      assert(events.contains(("+I", 16L)) && events.contains(("-D", 2L)))
    } finally q.stop()

    // restart with the saved state: no second snapshot, only new changes
    exec("INSERT INTO TA VALUES (17, 'y', 2.0)")
    val q2 = CdcCapture.captureStream(spark, url, "TA", "ID", chunkSize = 6,
      statePath, collectBatch, pollsPerSecond = 10.0)
    try {
      waitFor(!delivered.isEmpty)
      val after = Iterator.continually(delivered.poll()).takeWhile(_ != null).toSeq
      assert(after.forall(_._1 >= 0L), s"restart must not re-snapshot: $after")
      assert(after.flatMap(_._2).contains(("+I", 17L)))
      assert(!after.flatMap(_._2).exists(_ == (("+I", 16L))), "replayed an old event")
    } finally q2.stop()
  }

  test("captureStream -> Scd2: accumulated changelog survives a restart into exact history") {
    fresh("TS", 8)
    CdcCapture.installChangelog(url, "TS")
    val base = java.nio.file.Files.createTempDirectory("cdcscd2").toString
    val acc = s"$base/acc"
    val statePath = s"$base/state.properties"
    def accCount(): Long =
      try spark.read.parquet(acc).count() catch { case _: Throwable => 0L }
    def waitFor(target: Long): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (accCount() < target && System.currentTimeMillis() < deadline)
        Thread.sleep(150)
      assert(accCount() >= target, s"changelog did not reach $target rows")
    }
    val onB = (df: org.apache.spark.sql.DataFrame, _: Long) =>
      df.write.mode("append").parquet(acc)
    val q = CdcCapture.captureStream(spark, url, "TS", "ID", chunkSize = 5,
      statePath, onB, pollsPerSecond = 10.0)
    try {
      waitFor(8) // snapshot (+I, CL_SEQ 0) delivered first
      exec("UPDATE TS SET NAME = 'up_3' WHERE ID = 3", "DELETE FROM TS WHERE ID = 5")
      waitFor(8 + 3) // -U/+U for id 3, -D for id 5
    } finally q.stop()
    exec("UPDATE TS SET NAME = 'up_7' WHERE ID = 7") // while the job is DOWN
    val q2 = CdcCapture.captureStream(spark, url, "TS", "ID", chunkSize = 5,
      statePath, onB, pollsPerSecond = 10.0)
    try waitFor(8 + 3 + 2) finally q2.stop() // restart: only the new -U/+U
    val ch = spark.read.parquet(acc)
    // exactly-once across the restart: no change seq delivered twice
    assert(ch.where($"CL_SEQ" > 0).count() ==
      ch.where($"CL_SEQ" > 0).select("CL_SEQ").distinct().count())
    val hist = graft.operators.Scd2.fromChangelog(ch, Seq("ID"), "CL_SEQ")
      .orderBy("ID", "valid_from")
      .select($"ID", $"NAME", $"is_current")
      .collect().toSeq.groupBy(_.getLong(0))
    assert(hist(5L).map(r => (r.getString(1), r.getBoolean(2))) ==
      Seq(("name_5", false)), "deleted key: one closed version, no current")
    assert(hist(3L).map(r => (r.getString(1), r.getBoolean(2))) ==
      Seq(("name_3", false), ("up_3", true)))
    assert(hist(7L).map(r => (r.getString(1), r.getBoolean(2))) ==
      Seq(("name_7", false), ("up_7", true)), "post-restart change versioned")
    assert(hist(1L).map(r => (r.getString(1), r.getBoolean(2))) ==
      Seq(("name_1", true)), "untouched key: single current version")
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
