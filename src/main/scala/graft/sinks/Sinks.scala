package graft.sinks

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Sink connectors (SURVEY §2.4).
  *
  * References:
  *  - connector-file sinks (format + save mode + partition keys)
  *  - connector-console (ConsoleSinkWriter: log N rows per batch)
  *  - connector-assert (AssertSink: row-count and field rules evaluated at
  *    the end of the stream; failure aborts the job)
  */
object Sinks {

  // ---------- file ----------

  final case class FileSinkConfig(
      path: String,
      format: String, // parquet | orc | json | csv | text
      mode: String = "overwrite",
      partitionBy: Seq[String] = Nil,
      options: Map[String, String] = Map.empty)

  /** Charset-aware line writer (reference sink option `encoding`): Spark's
    * text/json writers are UTF-8 only, so non-UTF8 charsets (GBK, ...)
    * write per-partition files through JVM charsets — still one file per
    * partition, no driver funnel.
    */
  /** Charset-aware line writer (Spark's own text/json writers are UTF-8
    * only). Runs through the Hadoop FileSystem API (so hdfs:// and
    * object-store paths work, not just local disk) with per-task
    * temp-write + rename onto a destination name deterministic per
    * (job, partition) — a failed/retried task either wins the rename or
    * deletes its temp, so retries never leave duplicate part files
    * (ADVICE r6). partition_by is not supported on this path: fail fast
    * rather than silently ignore it.
    */
  private def writeLinesWithCharset(lines: DataFrame, path: String,
      charset: String, mode: String, partitionBy: Seq[String] = Nil): Unit = {
    require(partitionBy.isEmpty,
      s"charset text sink: partition_by ${partitionBy.mkString(",")} is not " +
        "supported with a non-UTF8 encoding; drop partition_by or write UTF-8")
    import org.apache.hadoop.fs.Path
    val sc = lines.sparkSession.sparkContext
    val confBc = sc.broadcast(new org.apache.spark.SerializableWritable(
      sc.hadoopConfiguration))
    val dir = new Path(path)
    val fs = dir.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(dir)) {
      if (mode == "overwrite") fs.delete(dir, true)
      else if (mode != "append")
        throw new IllegalArgumentException(s"charset text sink: path exists and mode=$mode")
    }
    fs.mkdirs(dir)
    val cs = charset
    // one id per write call: append jobs never collide with earlier files,
    // while task retries within a job stay idempotent
    val jobId = java.util.UUID.randomUUID().toString.take(8)
    lines.select(org.apache.spark.sql.functions.col("value")).foreachPartition {
      rows: Iterator[Row] =>
        if (rows.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val pfs = new Path(path).getFileSystem(confBc.value.value)
          val tmp = new Path(path, f".part-$pid%05d-$jobId-a${tc.taskAttemptId()}.tmp")
          val out = new java.io.OutputStreamWriter(pfs.create(tmp, true), cs)
          try rows.foreach { r => out.write(r.getString(0)); out.write("\n") }
          finally out.close()
          val dest = new Path(path, f"part-$pid%05d-$jobId.txt")
          if (!pfs.rename(tmp, dest)) { pfs.delete(tmp, false); () }
        }
    }
  }

  def writeFile(df: DataFrame, cfg: FileSinkConfig): Unit = {
    // reference option compress_codec (lzo/snappy/gzip/zstd/none) maps to
    // Spark's per-format "compression" writer option.
    val opts = cfg.options.get("compress_codec")
      .map(c => cfg.options - "compress_codec" + ("compression" -> c))
      .getOrElse(cfg.options)
    // reference sink `encoding`: non-UTF8 text/json lines go through the
    // charset-aware writer (Spark's own writers are UTF-8 only)
    val nonUtf8 = cfg.options.get("encoding").map(_.trim)
      .filter(e => e.nonEmpty && !e.equalsIgnoreCase("utf-8"))
    if (nonUtf8.isDefined && Set("text", "json").contains(cfg.format.toLowerCase)) {
      val lines = cfg.format.toLowerCase match {
        case "json" => df.toJSON.toDF("value")
        case _ => graft.formats.DelimitedTextFormat.toLines(df,
          graft.formats.DelimitedTextFormat.configFrom(opts))
      }
      return writeLinesWithCharset(lines, cfg.path, nonUtf8.get, cfg.mode, cfg.partitionBy)
    }
    var w: DataFrameWriter[Row] = df.write.mode(cfg.mode).options(opts)
    if (cfg.partitionBy.nonEmpty) w = w.partitionBy(cfg.partitionBy: _*)
    cfg.format.toLowerCase match {
      case "parquet" => w.parquet(cfg.path)
      case "orc" => w.orc(cfg.path)
      case "json" => w.json(cfg.path)
      case "csv" =>
        // Spark's csv writer rejects map/array/struct/binary columns; the
        // reference serializes complex values as JSON text and bytes as
        // their utf-8 string (TextDeserializationSchema BYTES round-trip)
        import org.apache.spark.sql.functions.{col => fcol, to_json}
        val csvSafe = df.select(df.schema.fields.toSeq.map { f =>
          f.dataType match {
            case _: org.apache.spark.sql.types.MapType |
                 _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.StructType =>
              to_json(fcol(f.name)).as(f.name)
            case org.apache.spark.sql.types.BinaryType =>
              fcol(f.name).cast("string").as(f.name)
            case _ => fcol(f.name)
          }
        }: _*)
        var cw: DataFrameWriter[Row] = csvSafe.write.mode(cfg.mode).options(opts)
        if (cfg.partitionBy.nonEmpty) cw = cw.partitionBy(cfg.partitionBy: _*)
        cfg.options.get("field_delimiter").foreach(d => cw = cw.option("delimiter", d))
        cw.option("header", cfg.options.getOrElse("header", "true")).csv(cfg.path)
      // multi-column frames (or an explicit field_delimiter) write the
      // reference's delimited text format; single-column frames go through
      // Spark's raw text writer
      case "text" if df.columns.length > 1 || cfg.options.contains("field_delimiter") =>
        graft.formats.DelimitedTextFormat.write(df, cfg.path,
          graft.formats.DelimitedTextFormat.configFrom(opts), cfg.mode)
      case "text" => w.text(cfg.path)
      case "xml" => w.option("rowTag", cfg.options.getOrElse("rowTag", "RECORD")).xml(cfg.path)
      case "avro" =>
        // mode semantics for the Hadoop-format writer: only overwrite/
        // errorifexists are meaningful (append would mix container files)
        val fs = new org.apache.hadoop.fs.Path(cfg.path)
          .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        if (fs.exists(new org.apache.hadoop.fs.Path(cfg.path))) {
          if (cfg.mode == "overwrite") fs.delete(new org.apache.hadoop.fs.Path(cfg.path), true)
          else throw new IllegalArgumentException(s"avro sink: path exists and mode=${cfg.mode}")
        }
        graft.formats.AvroFormat.write(df, cfg.path,
          opts.getOrElse("compression", "snappy"))
      case "excel" =>
        graft.formats.ExcelFormat.write(df, cfg.path,
          opts.getOrElse("header", "true").toBoolean)
      // reference BINARY file-copy sink: (data, relativePath[, partIndex])
      // rows reassemble into files (graft.sources.BinaryFiles). Mode
      // semantics like avro: overwrite clears the target dir (stale files
      // from a previous run would otherwise survive re-ingestion globs),
      // append adds/replaces named files, error refuses an existing dir.
      case "binary" =>
        val p = new org.apache.hadoop.fs.Path(cfg.path)
        val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) {
          if (cfg.mode == "overwrite") fs.delete(p, true)
          else if (cfg.mode != "append")
            throw new IllegalArgumentException(s"binary sink: path exists and mode=${cfg.mode}")
        }
        graft.sources.BinaryFiles.write(df, cfg.path)
      case other => throw new IllegalArgumentException(s"unsupported sink format: $other")
    }
  }

  /** Reference-style write: schema/data save modes run driver-side first
    * (directory create/recreate, content drop, error checks — see
    * [[SaveModes]]), then the rows append. Mirrors the reference's
    * SupportSaveMode contract for file sinks; the legacy Spark-mode
    * `writeFile` stays for callers that want writer-native semantics.
    */
  def writeFileWithSaveMode(df: DataFrame, cfg: FileSinkConfig,
      schemaMode: SaveModes.SchemaSaveMode, dataMode: SaveModes.DataSaveMode): Unit = {
    SaveModes.handle(schemaMode, dataMode, new SaveModes.FileBackend(df, cfg.path))
    writeFile(df, cfg.copy(mode = "append"))
  }

  /** Small-file compaction — the classic 100 TB operational problem:
    * streaming/partitioned writers leave thousands of KB-sized files whose
    * open/seek overhead dominates later scans. Rewrites a directory into
    * ceil(bytes / targetFileBytes) files and atomically swaps it in
    * (write to `<path>.__compact_tmp`, rename old out, rename tmp in), so
    * readers see either the old or the new layout, never a mix.
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      format: String = "parquet",
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val totalBytes = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = format match {
      case "parquet" => spark.read.parquet(path)
      case "orc" => spark.read.orc(path)
      case "json" => spark.read.json(path)
      case other => throw new IllegalArgumentException(s"compact: unsupported format $other")
    }
    val tmp = new org.apache.hadoop.fs.Path(path + ".__compact_tmp")
    df.repartition(n).write.mode("overwrite").format(format).save(tmp.toString)
    atomicSwapIn(fs, p, tmp, "compact")
    val after = fs.listStatus(p).count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    (files.length, after)
  }

  /** Double-rename swap: move `p` aside, rename `tmp` in, delete the old
    * version — readers see either the old or the new directory, never a
    * mix; a failed swap-in rolls the old directory back.
    */
  private def atomicSwapIn(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
      tag: String): Unit = {
    val old = new org.apache.hadoop.fs.Path(p.toString + s".__${tag}_old")
    fs.delete(old, true)
    if (!fs.rename(p, old)) throw new java.io.IOException(s"$tag: cannot move $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // roll back
      throw new java.io.IOException(s"$tag: cannot swap in $tmp")
    }
    fs.delete(old, true)
  }

  /** File-side MERGE INTO — the Delta/Iceberg upsert shape on a plain
    * parquet/orc/json directory: read the target, apply the row-kind
    * changelog SET-WISE (`applyCdcBatch`: last change per key wins,
    * +I/+U upsert, -D delete — one window + one join, never row-at-a-time),
    * write the new version next to the old one and atomically double-rename
    * it in. Readers see the old or the new table version, never a mix —
    * the poor man's snapshot isolation, same protocol as [[compact]].
    */
  def mergeInto(spark: org.apache.spark.sql.SparkSession, path: String,
      changes: DataFrame, keys: Seq[String], ordCol: String,
      format: String = "parquet"): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = format match {
      case "parquet" => spark.read.parquet(path)
      case "orc" => spark.read.orc(path)
      case "json" => spark.read.json(path)
      case other => throw new IllegalArgumentException(s"mergeInto: unsupported format $other")
    }
    val merged = graft.streaming.StreamingOps.applyCdcBatch(target, changes, keys, ordCol)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__merge_tmp")
    merged.write.mode("overwrite").format(format).save(tmp.toString)
    atomicSwapIn(fs, p, tmp, "merge")
  }

  // ---------- console ----------

  /** Print up to `limit` rows (driver-side, bounded — like the reference's
    * console sink which logs each row up to a configured count).
    */
  def console(df: DataFrame, limit: Int = 20, truncate: Boolean = false): Unit =
    df.show(limit, truncate)

  // ---------- assert ----------

  // Rule kinds mirror the reference AssertFieldRule.AssertRuleType
  // (connector-assert/.../rule/AssertFieldRule.java:25: NOT_NULL, MIN, MAX,
  // MIN_LENGTH, MAX_LENGTH, MIN_ROW, MAX_ROW, field type, equalTo) plus
  // regex matching.
  sealed trait AssertRule
  final case class RowCountBetween(min: Long, max: Long) extends AssertRule
  final case class NotNull(field: String) extends AssertRule
  final case class MinValue(field: String, min: Double) extends AssertRule
  final case class MaxValue(field: String, max: Double) extends AssertRule
  final case class MatchesRegex(field: String, regex: String) extends AssertRule
  final case class MinLength(field: String, min: Int) extends AssertRule
  final case class MaxLength(field: String, max: Int) extends AssertRule
  /** Every row's value must equal `value` (reference AssertRule.equalTo).
    * `value` may be a scalar, a Seq (array equality) or a Map (compared
    * entry-wise — Spark has no native map equality).
    */
  final case class EqualsValue(field: String, value: Any) extends AssertRule
  /** Every row's value must be NULL (reference rule_type NULL). */
  final case class IsNull(field: String) extends AssertRule
  /** Schema-level check: field exists with the given type (reference
    * AssertFieldRule.fieldType) — a zeta type string (`bytes`,
    * `map<string, string>`, `timestamp_tz`, ...) or a nested row object.
    * Evaluated without scanning data.
    */
  final case class FieldType(field: String, ddlType: Any) extends AssertRule

  final class AssertionFailed(msg: String) extends RuntimeException(msg)

  /** FieldType (schema-level) failures — free, no data scan. */
  private def schemaRuleFailures(df: DataFrame, rules: Seq[AssertRule]): Seq[String] =
    rules.collect {
      case FieldType(f, spec) =>
        df.schema.find(_.name == f) match {
          case None => Some(s"field $f missing")
          case Some(_) if spec.toString.trim.equalsIgnoreCase("null") =>
            // zeta types statically-null expressions as NULL; Spark may
            // give them a concrete type (e.g. a missing map key is typed
            // by the map's value type) — accept any type here and let the
            // companion NULL data rule enforce all-null values
            None
          case Some(sf) =>
            // zeta spellings + nested row objects resolve via ZetaSchema;
            // the reference vector types (api/table/type/VectorType.java)
            // land as float/double arrays
            val want = spec match {
              case s: String if s.trim.equalsIgnoreCase("float_vector") =>
                org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)
              case s: String if s.trim.equalsIgnoreCase("double_vector") =>
                org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)
              case other => graft.api.ZetaSchema.dataTypeOf(other)
            }
            // normalize nullability flags on both sides: config DDL can't
            // express containsNull/valueContainsNull
            def norm(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
              import org.apache.spark.sql.types._
              dt match {
                case ArrayType(et, _) => ArrayType(norm(et), containsNull = true)
                case MapType(k, v, _) => MapType(norm(k), norm(v), valueContainsNull = true)
                case StructType(fs) => StructType(fs.map(x =>
                  x.copy(dataType = norm(x.dataType), nullable = true)))
                case other => other
              }
            }
            if (norm(sf.dataType) != norm(want))
              Some(s"$f has type ${sf.dataType.simpleString}, expected ${want.simpleString}")
            else None
        }
    }.flatten

  /** The per-rule aggregate columns (`__n` + `__r<i>`), shared by the
    * throwing sink (`assertRules`) and the report form (`assertReport`) —
    * all data rules in ONE aggregation pass either way (the naive
    * per-rule pass would rescan a 100 TB input once per rule).
    */
  private def ruleAggs(df: DataFrame, rules: Seq[AssertRule]): Seq[org.apache.spark.sql.Column] = {
    // "differs from expected" predicate; arrays compare natively, maps
    // entry-wise (no native map equality in Spark)
    def mismatch(f: String, v: Any): org.apache.spark.sql.Column = v match {
      // a ROW expectation arrives as a positional list: build a struct
      // literal with each element cast to its field's type
      case s: Seq[_] if df.schema(f).dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
        val st = df.schema(f).dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
        val expected = org.apache.spark.sql.functions.struct(
          st.fields.toSeq.zip(s).map { case (fld, x) =>
            lit(if (x == null) null else x.toString).cast(fld.dataType).as(fld.name)
          }: _*)
        col(f).isNull || col(f) =!= expected
      case s: Seq[_] =>
        // literal elements arrive as strings (HOCON scalars); Spark does
        // not implicitly coerce array-to-array comparisons, so cast the
        // expectation to the column's actual array type
        col(f).isNull || col(f) =!= array(s.map(x => lit(x)): _*)
          .cast(df.schema(f).dataType)
      case m: Map[_, _] =>
        val entries = m.asInstanceOf[Map[String, Any]]
        val entryMismatch = entries.map { case (k, vv) =>
          !(col(f).getItem(k) <=> lit(vv))
        }.reduceOption(_ || _).getOrElse(lit(false))
        col(f).isNull || size(map_entries(col(f))) =!= lit(entries.size) || entryMismatch
      case _ => col(f).isNull || col(f) =!= lit(v)
    }

    count(lit(1)).as("__n") +: rules.zipWithIndex.flatMap {
      case (NotNull(f), i) => Seq(sum(when(col(f).isNull, 1).otherwise(0)).as(s"__r$i"))
      case (IsNull(f), i) => Seq(sum(when(col(f).isNotNull, 1).otherwise(0)).as(s"__r$i"))
      case (MinValue(f, _), i) => Seq(min(col(f).cast("double")).as(s"__r$i"))
      case (MaxValue(f, _), i) => Seq(max(col(f).cast("double")).as(s"__r$i"))
      case (MatchesRegex(f, re), i) =>
        Seq(sum(when(!regexp_like(col(f), lit(re)), 1).otherwise(0)).as(s"__r$i"))
      case (MinLength(f, _), i) => Seq(min(length(col(f))).as(s"__r$i"))
      case (MaxLength(f, _), i) => Seq(max(length(col(f))).as(s"__r$i"))
      case (EqualsValue(f, v), i) =>
        Seq(sum(when(mismatch(f, v), 1).otherwise(0)).as(s"__r$i"))
      case (RowCountBetween(_, _), _) | (FieldType(_, _), _) => Nil
    }
  }

  /** Evaluate all rules in ONE aggregation pass over the data, throwing
    * `AssertionFailed` with every violation (the reference Assert sink's
    * contract).
    */
  def assertRules(df: DataFrame, rules: Seq[AssertRule]): Unit = {
    // schema rules first: free, and failing fast beats scanning
    val schemaFailures = schemaRuleFailures(df, rules)
    if (schemaFailures.nonEmpty) throw new AssertionFailed(schemaFailures.mkString("; "))
    val aggs = ruleAggs(df, rules)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    val failures = rules.zipWithIndex.flatMap {
      case (RowCountBetween(lo, hi), _) =>
        if (n < lo || n > hi) Some(s"row count $n outside [$lo,$hi]") else None
      case (NotNull(f), i) =>
        val bad = row.getAs[Long](s"__r$i")
        if (bad > 0) Some(s"$f has $bad nulls") else None
      case (IsNull(f), i) =>
        val bad = row.getAs[Long](s"__r$i")
        if (bad > 0) Some(s"$f has $bad non-null rows") else None
      case (MinValue(f, lo), i) =>
        val v = row.getAs[Double](s"__r$i")
        if (v < lo) Some(s"min($f)=$v < $lo") else None
      case (MaxValue(f, hi), i) =>
        val v = row.getAs[Double](s"__r$i")
        if (v > hi) Some(s"max($f)=$v > $hi") else None
      case (MatchesRegex(f, re), i) =>
        val bad = row.getAs[Long](s"__r$i")
        if (bad > 0) Some(s"$f has $bad rows not matching /$re/") else None
      case (MinLength(f, lo), i) =>
        val v = row.getAs[Number](s"__r$i").intValue() // int natively, long if zeta length
        if (v < lo) Some(s"min(length($f))=$v < $lo") else None
      case (MaxLength(f, hi), i) =>
        val v = row.getAs[Number](s"__r$i").intValue()
        if (v > hi) Some(s"max(length($f))=$v > $hi") else None
      case (EqualsValue(f, value), i) =>
        val bad = row.getAs[Long](s"__r$i")
        if (bad > 0) Some(s"$f has $bad rows != $value") else None
      case (FieldType(_, _), _) => None
    }
    if (failures.nonEmpty) throw new AssertionFailed(failures.mkString("; "))
  }

  /** Rule evaluation as DATA: one row per rule — (rule_no, rule, field,
    * measured, passed) — computed from the same single-pass aggregates as
    * `assertRules`. The one agg row fans out through an explode, so the
    * whole report is in-plan (no driver collect) and oracle-checkable
    * (q_assert_sink). `measured` is the rule's governing statistic: the
    * row count, the violating-row count, or the min/max being bounded.
    */
  def assertReport(df: DataFrame, rules: Seq[AssertRule]): DataFrame = {
    val aggs = ruleAggs(df, rules)
    val agg = df.agg(aggs.head, aggs.tail: _*)
    val schemaBad = schemaRuleFailures(df, rules).toSet
    val entries = rules.zipWithIndex.map { case (r, i) =>
      val m = col(s"__r$i")
      val (kind, field, measured, passed) = r match {
        case RowCountBetween(lo, hi) =>
          ("row_count_between", "", col("__n").cast("double"),
            col("__n") >= lo && col("__n") <= hi)
        case NotNull(f) => ("not_null", f, m.cast("double"), m === 0)
        case IsNull(f) => ("is_null", f, m.cast("double"), m === 0)
        case MinValue(f, lo) => ("min_value", f, m.cast("double"), m >= lo)
        case MaxValue(f, hi) => ("max_value", f, m.cast("double"), m <= hi)
        case MatchesRegex(f, _) => ("matches_regex", f, m.cast("double"), m === 0)
        case MinLength(f, lo) => ("min_length", f, m.cast("double"), m >= lo)
        case MaxLength(f, hi) => ("max_length", f, m.cast("double"), m <= hi)
        case EqualsValue(f, _) => ("equals_value", f, m.cast("double"), m === 0)
        case FieldType(f, _) =>
          // schema-level: verdict is static; measured has no data statistic
          ("field_type", f, lit(null).cast("double"),
            lit(!schemaBad.exists(msg =>
              msg == s"field $f missing" || msg.startsWith(s"$f "))))
      }
      struct(lit(i).cast("int").as("rule_no"), lit(kind).as("rule"),
        lit(field).as("field"), measured.as("measured"), passed.as("passed"))
    }
    agg.select(explode(array(entries: _*)).as("r")).select("r.*")
  }
}
