package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-file binary ingestion / emission (SURVEY §2.4) — the reference's
  * BINARY file format for lossless file copy
  * (connector-file-base/.../source/reader/BinaryReadStrategy.java:21 —
  * rows of (data, relativePath, partIndex); sink side
  * BinaryWriteStrategy reassembles parts into files).
  *
  * Spark-first shape: the read is Spark's `binaryFile` datasource (one
  * task per file, driver never touches content; pushdown-prunes `content`
  * when only metadata is selected), projected to the reference's column
  * contract. An optional `chunk_size` re-chunks content into
  * reference-style bounded parts with `sequence` + `substr` — codegen'd,
  * no UDF. The write side streams rows back into files through the Hadoop
  * FileSystem per partition (no driver funnel); rows are hash-partitioned
  * by relativePath and sorted by partIndex so each file writes
  * sequentially in one task regardless of chunking.
  */
object BinaryFiles {

  /** Read files under `path` as (data: binary, relativePath: string,
    * partIndex: long). Options: `path_glob` filters file names;
    * `chunk_size` splits content into parts of at most that many bytes
    * (the reference chunks at 1024).
    */
  def read(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseUri = fs.makeQualified(p).toString
    var r = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true") // reference reads nested dirs
    options.get("path_glob").foreach(g => r = r.option("pathGlobFilter", g))
    val raw = r.load(path)
    // relativePath mirrors BinaryReadStrategy: path minus the base dir
    // (bare file name when `path` is a single file)
    val rel = regexp_replace(col("path"),
      lit("^" + java.util.regex.Pattern.quote(baseUri) + "/?"), lit(""))

    options.get("chunk_size").map(_.toInt) match {
      case None =>
        raw.select(col("content").as("data"), rel.as("relativePath"),
          lit(0L).as("partIndex"))
      case Some(chunk) =>
        require(chunk > 0, "binary source: chunk_size must be positive")
        val nParts = greatest(ceil(col("length") / lit(chunk.toDouble)).cast("long"), lit(1L))
        raw.select(col("content"), rel.as("relativePath"),
            explode(sequence(lit(0L), nParts - 1)).as("partIndex"))
          .select(
            col("content").substr((col("partIndex") * chunk + 1).cast("int"), lit(chunk)).as("data"),
            col("relativePath"), col("partIndex"))
    }
  }

  /** Write (data, relativePath[, partIndex]) rows back into files under
    * `path` — the reference BinaryWriteStrategy contract, so
    * read(chunk_size=N) |> write is a lossless distributed file copy.
    */
  def write(df: DataFrame, path: String): Unit = {
    val hasPart = df.columns.contains("partIndex")
    val keyed = if (hasPart) df.select("relativePath", "partIndex", "data")
                else df.select(col("relativePath"), lit(0L).as("partIndex"), col("data"))
    keyed
      .repartition(col("relativePath"))
      .sortWithinPartitions("relativePath", "partIndex")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        // executor-side Configuration: loads core-site from the executor
        // classpath, same resolution as every Hadoop output committer
        val base = new org.apache.hadoop.fs.Path(path)
        val fs = base.getFileSystem(new org.apache.hadoop.conf.Configuration())
        var current: String = null
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        try {
          it.foreach { row =>
            val rel = row.getAs[String]("relativePath")
            if (rel != current) {
              if (out != null) out.close()
              val target = new org.apache.hadoop.fs.Path(base, rel)
              fs.mkdirs(target.getParent)
              out = fs.create(target, true)
              current = rel
            }
            out.write(row.getAs[Array[Byte]]("data"))
          }
        } finally if (out != null) out.close()
      }
  }
}
