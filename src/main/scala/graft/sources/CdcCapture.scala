package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RowKindOps

/** CDC SOURCE capture (SURVEY §2.4) — the reference's incremental-snapshot
  * framework, re-expressed for Spark's execution model.
  *
  * Reference: seatunnel-connectors-v2/connector-cdc/connector-cdc-base —
  * `source/enumerator/splitter/AbstractJdbcSourceChunkSplitter.java`
  * (PK-chunked snapshot splits), `source/split/SnapshotSplit.java`
  * (split + low/high watermark), `source/enumerator/HybridSplitAssigner.java`
  * (snapshot phase then incremental phase), `source/offset/Offset.java`
  * (comparable stream position). The underlying algorithm is the published
  * DBLog watermark protocol (Andreozzi & others, Netflix DBLog paper):
  * bracket each chunk read between a low and a high watermark taken on the
  * change stream, then reconcile the in-window change events onto the chunk
  * rows so the snapshot is consistent as of the high watermark; afterwards
  * stream changes strictly beyond it. Exactly-once follows from the
  * watermark arithmetic, not from locks.
  *
  * Spark mapping (the architecture, not a translation):
  *  - Snapshot splits are JDBC partition predicates: ONE distributed
  *    `spark.read.jdbc(url, table, predicates)` fans the chunk reads out
  *    across the cluster — the reference's split readers are Spark tasks.
  *  - The change stream is a trigger-populated changelog table (op CHAR(2)
  *    in the RowKind alphabet +I/-U/+U/-D plus a monotonically-increasing
  *    CL_SEQ identity) — the embedded, zero-egress stand-in for a binlog.
  *    The offset model is just CL_SEQ: totally ordered, resumable,
  *    comparable — and a bounded seq range is an IMMUTABLE slice of an
  *    append-only table, so changelog reads are repeatable and can stay
  *    lazy in the Spark plan.
  *  - Watermark reconciliation is set-wise: the whole (low, high] window
  *    applies onto the chunk rows in one `applyCdcBatch` (latest-by-seq
  *    upsert/delete per key) instead of the reference's row-at-a-time
  *    normalize loop. Replaying an event already visible in a chunk read
  *    is idempotent by construction (same-key same-value upsert).
  *  - Chunk rows ARE materialized inside the watermark bracket
  *    (localCheckpoint or durable parquet): a lazy JDBC scan of a mutable
  *    table would otherwise execute after the high watermark and silently
  *    break the as-of contract. This is the one place eagerness is
  *    semantics, not tuning.
  *
  * Splitter fidelity (r9): [[planSplitsAuto]] mirrors the reference's full
  * `splitTableIntoChunks` decision tree — evenly-sized chunks when the
  * numeric split column's distribution factor (range/rowcount) sits inside
  * [lower, upper]; quantile bounds from a systematic row sample when the
  * key is skewed/sparse and the shard count crosses the sampling threshold
  * (`sampleDataFromColumn` + `efficientShardingThroughSampling`); and the
  * walk-the-next-chunk-max loop (`splitUnevenlySizedChunks` /
  * `queryNextChunkMax`) for small skewed tables and non-numeric keys.
  */
object CdcCapture {

  /** One PK-range chunk: [lo, hi) with open ends as None (the reference's
    * ChunkRange: first chunk unbounded low, last unbounded high). Bounds
    * are carried as strings and rendered as SQL literals — `quoted` marks
    * character keys (escaped) vs numeric keys (verbatim).
    */
  final case class SnapshotSplit(splitId: Int, lo: Option[String],
      hi: Option[String], quoted: Boolean = false) {
    private def sqlLit(v: String): String =
      if (quoted) "'" + v.replace("'", "''") + "'" else v
    def predicate(pkCol: String): String = (lo, hi) match {
      case (Some(l), Some(h)) => s"$pkCol >= ${sqlLit(l)} AND $pkCol < ${sqlLit(h)}"
      case (Some(l), None)    => s"$pkCol >= ${sqlLit(l)}"
      case (None, Some(h))    => s"$pkCol < ${sqlLit(h)}"
      case (None, None)       => "1=1"
    }
  }

  /** Resumable capture position: remaining snapshot splits (empty once the
    * snapshot phase is done) + the stream offset (events with seq beyond it
    * have not been delivered). Serializes to a properties file.
    */
  final case class CaptureState(
      table: String, pkCol: String,
      pendingSplits: Seq[SnapshotSplit], streamOffset: Long) {
    def save(path: String): Unit = {
      val p = new Properties()
      p.setProperty("table", table)
      p.setProperty("pkCol", pkCol)
      p.setProperty("streamOffset", streamOffset.toString)
      // bounds are URL-encoded: string keys may contain the separators
      def enc(v: Option[String]) = v.map(
        java.net.URLEncoder.encode(_, "UTF-8")).getOrElse("")
      p.setProperty("pendingSplits", pendingSplits
        .map(s => s"${s.splitId}:${s.quoted}:${enc(s.lo)}:${enc(s.hi)}")
        .mkString(","))
      val out = new java.io.FileOutputStream(path)
      try p.store(out, "graft cdc capture state") finally out.close()
    }
  }

  object CaptureState {
    def load(path: String): CaptureState = {
      val p = new Properties()
      val in = new java.io.FileInputStream(path)
      try p.load(in) finally in.close()
      def dec(v: String) = Some(v).filter(_.nonEmpty)
        .map(java.net.URLDecoder.decode(_, "UTF-8"))
      val splits = Option(p.getProperty("pendingSplits")).filter(_.nonEmpty)
        .map(_.split(",").toSeq.map { s =>
          val Array(id, q, lo, hi) = s.split(":", -1)
          SnapshotSplit(id.toInt, dec(lo), dec(hi), q.toBoolean)
        }).getOrElse(Nil)
      CaptureState(p.getProperty("table"), p.getProperty("pkCol"),
        splits, p.getProperty("streamOffset").toLong)
    }
  }

  def changelogTable(table: String): String = s"CL_${table.toUpperCase}"

  private def withConn[T](url: String)(f: Connection => T): T = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** Render a column's database type from JDBC metadata (Derby dialect —
    * the embedded database this runs against).
    */
  private def sqlType(md: java.sql.ResultSetMetaData, i: Int): String = {
    import java.sql.Types._
    md.getColumnType(i) match {
      case BIGINT => "BIGINT"
      case INTEGER => "INTEGER"
      case SMALLINT => "SMALLINT"
      case DOUBLE | FLOAT => "DOUBLE"
      case REAL => "REAL"
      case DECIMAL | NUMERIC => s"DECIMAL(${md.getPrecision(i)},${md.getScale(i)})"
      case VARCHAR => s"VARCHAR(${md.getPrecision(i)})"
      case CHAR => s"CHAR(${md.getPrecision(i)})"
      case LONGVARCHAR => "LONG VARCHAR"
      case TIMESTAMP => "TIMESTAMP"
      case DATE => "DATE"
      case BOOLEAN => "BOOLEAN"
      case BLOB => "BLOB"
      case CLOB => "CLOB"
      case t => throw new IllegalArgumentException(
        s"cdc capture: unsupported column type $t for ${md.getColumnName(i)}")
    }
  }

  /** Tear down a capture fixture: drop the triggers, the changelog, and
    * the base table if present, in dependency order. Derby REFUSES to drop
    * `CL_<table>` while `table`'s triggers reference it in their action
    * body (error X0Y25) — a `DROP TABLE CL_..., DROP TABLE <table>`
    * sequence with swallowed exceptions leaves the STALE changelog in
    * place, and the subsequent [[installChangelog]] no-ops on the
    * existing-CL check, so the re-created base table has NO capture
    * triggers: a re-run in the same JVM silently captures nothing (the
    * r12 bench showed exactly this — rep 2+ of the Derby-backed driver
    * queries returned snapshot-only results after a full poll-deadline
    * stall). Triggers first, then the changelog, then the base table.
    */
  def reset(url: String, table: String): Unit = withConn(url) { conn =>
    val st = conn.createStatement()
    def tryExec(sql: String): Unit =
      try { st.executeUpdate(sql); () }
      catch { case _: java.sql.SQLException => () } // absent on first run
    try {
      Seq("I", "UB", "UA", "D").foreach(s => tryExec(s"DROP TRIGGER TRG_${table}_$s"))
      tryExec(s"DROP TABLE ${changelogTable(table)}")
      tryExec(s"DROP TABLE $table")
    } finally st.close()
  }

  /** Install the capture edge for `table`: a CL_<table> changelog (CL_SEQ
    * identity + CL_OP row-kind + the source columns) and AFTER triggers for
    * insert/delete/update. The two update triggers are created before/after
    * in that order — Derby fires same-event triggers in creation order, so
    * every -U (old image) sequences before its +U (new image) and
    * latest-by-seq merge semantics hold without tie-breaking.
    * Idempotent: a second install on the same table is a no-op.
    * Returns the changelog table name.
    */
  def installChangelog(url: String, table: String): String = {
    val cl = changelogTable(table)
    withConn(url) { conn =>
      val exists = {
        val rs = conn.getMetaData.getTables(null, null, cl, null)
        try rs.next() finally rs.close()
      }
      if (!exists) {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(s"SELECT * FROM $table WHERE 1=0")
          val md = rs.getMetaData
          val cols = (1 to md.getColumnCount).map(i => md.getColumnName(i) -> sqlType(md, i))
          rs.close()
          require(!cols.exists { case (n, _) => n == "CL_SEQ" || n == "CL_OP" },
            s"cdc capture: $table already has a CL_SEQ/CL_OP column")
          st.executeUpdate(
            s"""CREATE TABLE $cl (
               |  CL_SEQ BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1) PRIMARY KEY,
               |  CL_OP CHAR(2) NOT NULL,
               |  ${cols.map { case (n, t) => s"$n $t" }.mkString(", ")})""".stripMargin)
          val colList = cols.map(_._1).mkString(", ")
          def vals(alias: String) = cols.map(c => s"$alias.${c._1}").mkString(", ")
          st.executeUpdate(
            s"""CREATE TRIGGER TRG_${table}_I AFTER INSERT ON $table
               |REFERENCING NEW AS N FOR EACH ROW
               |INSERT INTO $cl (CL_OP, $colList) VALUES ('+I', ${vals("N")})""".stripMargin)
          st.executeUpdate(
            s"""CREATE TRIGGER TRG_${table}_UB AFTER UPDATE ON $table
               |REFERENCING OLD AS O FOR EACH ROW
               |INSERT INTO $cl (CL_OP, $colList) VALUES ('-U', ${vals("O")})""".stripMargin)
          st.executeUpdate(
            s"""CREATE TRIGGER TRG_${table}_UA AFTER UPDATE ON $table
               |REFERENCING NEW AS N FOR EACH ROW
               |INSERT INTO $cl (CL_OP, $colList) VALUES ('+U', ${vals("N")})""".stripMargin)
          st.executeUpdate(
            s"""CREATE TRIGGER TRG_${table}_D AFTER DELETE ON $table
               |REFERENCING OLD AS O FOR EACH ROW
               |INSERT INTO $cl (CL_OP, $colList) VALUES ('-D', ${vals("O")})""".stripMargin)
        } finally st.close()
      }
    }
    cl
  }

  /** Current head of the change stream (0 = empty changelog). One scalar
    * query on the driver — the offset probe, not a data path.
    */
  def maxSeq(url: String, table: String): Long = withConn(url) { conn =>
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"SELECT MAX(CL_SEQ) FROM ${changelogTable(table)}")
      rs.next()
      val v = rs.getLong(1); if (rs.wasNull()) 0L else v
    } finally st.close()
  }

  /** Splitter thresholds — the reference's option defaults
    * (`SourceOptions`: split size 8096, distribution factor bounds
    * [0.05, 100], sample-sharding threshold 1000 shards, inverse sampling
    * rate 1000).
    */
  final case class SplitterConfig(
      chunkSize: Long = 8096L,
      distributionFactorLower: Double = 0.05,
      distributionFactorUpper: Double = 100.0,
      sampleShardingThreshold: Long = 1000L,
      inverseSamplingRate: Long = 1000L)

  /** PK-chunked snapshot splits over an evenly-distributed numeric key —
    * the reference's splitEvenlySizedChunks with distribution factor 1.
    * Kept as the direct entry point for known-dense keys;
    * [[planSplitsAuto]] is the full decision tree.
    */
  def planSplits(url: String, table: String, pkCol: String, chunkSize: Long): Seq[SnapshotSplit] = {
    require(chunkSize > 0, "cdc capture: chunkSize must be positive")
    val (minO, maxO, count) = queryMinMaxCount(url, table, pkCol)
    if (count == 0) return Seq(SnapshotSplit(0, None, None))
    splitEvenlySizedChunks(minO.get.toLong, maxO.get.toLong, count, chunkSize,
      dynamicChunkSize = chunkSize)
  }

  /** The reference's full `splitTableIntoChunks` decision tree:
    *  - numeric key, distribution factor (range+1)/rowcount inside
    *    [lower, upper] -> evenly-sized chunks, chunk width scaled by the
    *    factor;
    *  - numeric key, factor outside the bounds and enough shards to
    *    amortize a sample -> systematic row sample (every rate-th row in
    *    key order), shard bounds at sample quantiles;
    *  - otherwise (small skewed tables, character keys) -> walk the table
    *    in exact chunkSize steps via next-chunk-max queries.
    * Every path yields ranges with open first/last ends, so concurrent
    * inserts outside [min, max] still land in some split.
    */
  def planSplitsAuto(url: String, table: String, pkCol: String,
      cfg: SplitterConfig = SplitterConfig()): Seq[SnapshotSplit] = {
    require(cfg.chunkSize > 0, "cdc capture: chunkSize must be positive")
    val numeric = isNumericKey(url, table, pkCol)
    val (minO, maxO, count) = queryMinMaxCount(url, table, pkCol)
    if (count == 0 || minO.isEmpty || minO == maxO)
      return Seq(SnapshotSplit(0, None, None))
    if (numeric) {
      val (min, max) = (BigDecimal(minO.get), BigDecimal(maxO.get))
      val factor = ((max - min + 1) / count).toDouble
      if (factor >= cfg.distributionFactorLower && factor <= cfg.distributionFactorUpper) {
        val dynamic = math.max(1L, (factor * cfg.chunkSize).toLong)
        splitEvenlySizedChunks(min.toLong, max.toLong, count, cfg.chunkSize, dynamic)
      } else {
        val shardCount = count / cfg.chunkSize
        if (shardCount > cfg.sampleShardingThreshold) {
          // keep at least one sampled row per shard
          val rate = math.min(cfg.inverseSamplingRate, cfg.chunkSize)
          val sample = sampleKeyColumn(url, table, pkCol, rate)
            .sortBy(BigDecimal(_))
          shardsFromSample(sample, shardCount, quoted = false)
        } else splitUnevenlySizedChunks(url, table, pkCol, cfg.chunkSize, quoted = false)
      }
    } else splitUnevenlySizedChunks(url, table, pkCol, cfg.chunkSize, quoted = true)
  }

  private def queryMinMaxCount(url: String, table: String,
      pkCol: String): (Option[String], Option[String], Long) =
    withConn(url) { conn =>
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT MIN($pkCol), MAX($pkCol), COUNT(*) FROM $table")
        rs.next()
        (Option(rs.getString(1)), Option(rs.getString(2)), rs.getLong(3))
      } finally st.close()
    }

  private def isNumericKey(url: String, table: String, pkCol: String): Boolean =
    withConn(url) { conn =>
      val st = conn.createStatement()
      try {
        import java.sql.Types._
        val rs = st.executeQuery(s"SELECT $pkCol FROM $table WHERE 1=0")
        val t = rs.getMetaData.getColumnType(1)
        rs.close()
        Set(BIGINT, INTEGER, SMALLINT, TINYINT, DECIMAL, NUMERIC).contains(t)
      } finally st.close()
    }

  /** splitEvenlySizedChunks: tumble [min, max] in dynamicChunkSize steps;
    * a table no larger than one chunk is a single full-scan split.
    */
  private def splitEvenlySizedChunks(min: Long, max: Long, count: Long,
      chunkSize: Long, dynamicChunkSize: Long): Seq[SnapshotSplit] = {
    if (count <= chunkSize) return Seq(SnapshotSplit(0, None, None))
    val ends = Iterator.iterate(min + dynamicChunkSize)(_ + dynamicChunkSize)
      .takeWhile(e => e <= max && e > min /* overflow guard */).toSeq
    val bounds = (None +: ends.map(e => Some(e.toString))) :+ None
    bounds.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      SnapshotSplit(i, lo, hi)
    }.toSeq
  }

  /** sampleDataFromColumn: every rate-th row of the table (systematic row
    * sample by row number — value-skew cannot starve it, unlike MOD on the
    * key). One bounded metadata query of ~count/rate keys on the driver.
    */
  private def sampleKeyColumn(url: String, table: String, pkCol: String,
      rate: Long): Seq[String] =
    withConn(url) { conn =>
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT K FROM (
             |  SELECT $pkCol AS K, ROW_NUMBER() OVER () AS RN FROM $table
             |) T WHERE MOD(RN, $rate) = 0""".stripMargin)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) buf += rs.getString(1)
        buf.toSeq
      } finally st.close()
    }

  /** efficientShardingThroughSampling: shard bounds at sample quantiles;
    * consecutive equal sample values collapse (no empty/duplicate ranges).
    */
  private def shardsFromSample(sorted: Seq[String], shardCount: Long,
      quoted: Boolean): Seq[SnapshotSplit] = {
    if (sorted.isEmpty || shardCount <= 0) return Seq(SnapshotSplit(0, None, None))
    val perShard = sorted.length.toDouble / shardCount
    val rawBounds: Seq[String] =
      if (perShard <= 1) sorted
      else (1L until shardCount).map(i => sorted((i * perShard).toInt))
    val bounds = rawBounds.foldLeft(Vector.empty[String]) { (acc, b) =>
      if (acc.lastOption.contains(b)) acc else acc :+ b
    }
    ((None +: bounds.map(Some(_))) :+ None).sliding(2).zipWithIndex.map {
      case (Seq(lo, hi), i) => SnapshotSplit(i, lo, hi, quoted)
    }.toSeq
  }

  /** splitUnevenlySizedChunks + queryNextChunkMax: walk the key space in
    * exact chunkSize-row steps — each bound is MAX(key) of the next
    * chunkSize rows at-or-beyond the previous bound, so every chunk holds
    * ~chunkSize rows no matter how skewed or sparse the key is. One
    * bounded driver query per chunk (the reference pays the same; it even
    * sleeps between probes to spare the source).
    */
  private def splitUnevenlySizedChunks(url: String, table: String, pkCol: String,
      chunkSize: Long, quoted: Boolean): Seq[SnapshotSplit] =
    withConn(url) { conn =>
      def lit(v: String) = if (quoted) "'" + v.replace("'", "''") + "'" else v
      val st = conn.createStatement()
      try {
        def one(q: String): Option[String] = {
          val rs = st.executeQuery(q)
          try { rs.next(); Option(rs.getString(1)) } finally rs.close()
        }
        val max = one(s"SELECT MAX($pkCol) FROM $table")
        def nextChunkEnd(prev: Option[String]): Option[String] = {
          val where = prev.map(p => s"WHERE $pkCol >= ${lit(p)}").getOrElse("")
          val end = one(
            s"""SELECT MAX(K) FROM (
               |  SELECT $pkCol AS K FROM $table $where
               |  ORDER BY $pkCol FETCH FIRST $chunkSize ROWS ONLY) T""".stripMargin)
          // a bound equal to its predecessor would loop: step to the next
          // distinct key beyond it (the reference's queryMin fallback)
          val stepped =
            if (end.isDefined && end == prev)
              one(s"SELECT MIN($pkCol) FROM $table WHERE $pkCol > ${lit(end.get)}")
            else end
          stepped.filter(s => max.exists(m => compareKeys(s, m, quoted) < 0))
        }
        val bounds = Iterator.iterate(nextChunkEnd(None))(e => nextChunkEnd(e))
          .takeWhile(_.isDefined).map(_.get).toVector
        ((None +: bounds.map(Some(_))) :+ None).sliding(2).zipWithIndex.map {
          case (Seq(lo, hi), i) => SnapshotSplit(i, lo, hi, quoted)
        }.toSeq
      } finally st.close()
    }

  private def compareKeys(a: String, b: String, quoted: Boolean): Int =
    if (quoted) a.compareTo(b) else BigDecimal(a).compare(BigDecimal(b))

  /** Distributed chunk read: one Spark JDBC partition per split. */
  def readSplits(spark: SparkSession, url: String, table: String, pkCol: String,
      splits: Seq[SnapshotSplit]): DataFrame = {
    val props = new Properties()
    spark.read.jdbc(url, table, splits.map(_.predicate(pkCol)).toArray, props)
  }

  /** Change events with (loExcl, hiIncl] — a closed, immutable slice of the
    * append-only changelog, safe to keep lazy. Emits the RowKind column
    * (`__row_kind`) + CL_SEQ (the merge order) + the data columns, i.e.
    * directly consumable by StreamingOps.applyCdcBatch / applyCdcStream.
    */
  def changesBetween(spark: SparkSession, url: String, table: String,
      loExcl: Long, hiIncl: Long): DataFrame = {
    val cl = changelogTable(table)
    spark.read.format("jdbc").option("url", url)
      .option("query",
        s"SELECT * FROM $cl WHERE CL_SEQ > $loExcl AND CL_SEQ <= $hiIncl")
      .load()
      .withColumn(RowKindOps.RowKindCol, trim(col("CL_OP")))
      .drop("CL_OP")
  }

  /** Snapshot phase: watermark-bracketed distributed chunk read +
    * set-wise reconciliation. Returns the consistent-as-of-high-watermark
    * snapshot and the capture state whose streamOffset IS that watermark —
    * [[changesSince]] from it is gap-free and duplicate-free.
    *
    * `materializeDir`: Some(dir) persists chunk rows as parquet (durable —
    * survives executor loss, resumable); None uses localCheckpoint (fast,
    * in-memory; an executor loss fails the job rather than silently
    * re-reading the mutable source, which is the correct failure mode).
    * `beforeRead` is a test seam executed between the low watermark and
    * the chunk read (where concurrent writes land in production).
    */
  def snapshot(spark: SparkSession, url: String, table: String, pkCol: String,
      chunkSize: Long, materializeDir: Option[String] = None,
      beforeRead: () => Unit = () => ()): (DataFrame, CaptureState) = {
    // the full decision tree: skewed/sparse/character keys get sampled or
    // walked splits instead of pathological evenly-spaced ones
    val splits = planSplitsAuto(url, table, pkCol, SplitterConfig(chunkSize = chunkSize))
    val low = maxSeq(url, table)
    beforeRead()
    val chunks0 = readSplits(spark, url, table, pkCol, splits)
    val chunks = materializeDir match {
      case Some(dir) =>
        chunks0.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      case None =>
        val cp = chunks0.localCheckpoint(eager = true)
        cp.count() // force every partition inside the watermark bracket
        cp
    }
    val high = maxSeq(url, table)
    val consistent =
      if (high == low) chunks
      else graft.streaming.StreamingOps.applyCdcBatch(
        chunks, changesBetween(spark, url, table, low, high), Seq(pkCol), "CL_SEQ")
    (consistent, CaptureState(table, pkCol, Nil, streamOffset = high))
  }

  /** Incremental phase: one poll. Delivers events strictly beyond
    * `state.streamOffset` up to the current head, and the advanced state.
    * Each event range is delivered exactly once across polls/restarts
    * because the offset is the totally-ordered CL_SEQ.
    */
  def changesSince(spark: SparkSession, url: String,
      state: CaptureState): (DataFrame, CaptureState) = {
    val head = maxSeq(url, state.table)
    val batch = changesBetween(spark, url, state.table, state.streamOffset, head)
    (batch, state.copy(streamOffset = head))
  }

  /** Hybrid snapshot→incremental capture as ONE Structured Streaming job —
    * the reference's HybridSplitAssigner story (snapshot splits first,
    * then the stream split), expressed as a rate-source-clocked
    * foreachBatch driver:
    *
    *  - First tick with no saved state runs the watermark-bracketed
    *    [[snapshot]] and delivers it to `onBatch` as +I rows (CL_SEQ 0,
    *    batchId -1), then persists the state whose streamOffset is the
    *    snapshot's high watermark.
    *  - Every tick polls [[changesSince]]; a non-empty window is delivered
    *    exactly once (the offset advances with the delivery and persists
    *    per batch, so a restart resumes gap-free and duplicate-free).
    *  - A restart with `statePath` present SKIPS the snapshot phase —
    *    stop/start is the reference's job-restore behavior.
    *
    * The rate source is a clock, not data: one row/sec bounds the poll
    * frequency; the JDBC head probe is one scalar query per tick. Change
    * delivery itself is a distributed read of the bounded seq window.
    */
  def captureStream(spark: SparkSession, url: String, table: String,
      pkCol: String, chunkSize: Long, statePath: String,
      onBatch: (DataFrame, Long) => Unit,
      pollsPerSecond: Double = 2.0): org.apache.spark.sql.streaming.StreamingQuery = {
    val clock = spark.readStream.format("rate")
      .option("rowsPerSecond", math.max(1L, pollsPerSecond.toLong).toString).load()
    // single-threaded micro-batch execution: `state` is confined to the
    // stream's batch thread
    var state: CaptureState = null
    clock.writeStream
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        if (state == null) {
          state =
            if (new java.io.File(statePath).exists()) CaptureState.load(statePath)
            else {
              val (snap, st) = snapshot(spark, url, table, pkCol, chunkSize)
              onBatch(snap
                .withColumn("CL_SEQ", lit(0L))
                .withColumn(RowKindOps.RowKindCol, lit("+I")), -1L)
              st.save(statePath)
              st
            }
        }
        val (batch, advanced) = changesSince(spark, url, state)
        if (advanced.streamOffset > state.streamOffset) {
          onBatch(batch, batchId)
          advanced.save(statePath)
          state = advanced
        }
      }
      .start()
  }
}
