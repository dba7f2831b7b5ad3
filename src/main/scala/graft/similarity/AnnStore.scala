package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** PERSISTED IVF ANN index (VERDICT r12 #6) — the production daily-ingest
  * shape for similarity search, the [[graft.dedup.Dedup.writeSignatures]]
  * treatment applied to ANN: train + assign ONCE, save centroids and the
  * cell-assigned corpus as parquet, then every probe call reads only the
  * probed cells and never re-encodes (or even re-reads) the rest of the
  * corpus.
  *
  * Layout under `dir`:
  *   - `centroids.parquet` — (cell: int, centroid: array<double>), nLists
  *     rows, a few KB; collected to the driver at probe/append time.
  *   - `corpus.parquet` — (id, vec) PARTITIONED BY (cell): Spark writes
  *     one `cell=N/` directory per inverted list, so a probe's
  *     `cell IN (...)` filter prunes at the FILE level — at 100 TB a
  *     4-of-64-cell probe scans 1/16th of the bytes, and the pruning is
  *     static metadata, not a runtime filter.
  *
  * Probe-time pruning is deliberately STATIC: the probed-cell set is
  * bounded by nLists (tiny) whatever the query count, so the probe plan
  * collects the distinct probed cells (one pass over the query side,
  * which the ANN contract already assumes is the small side) and plants
  * them as an `isin` literal the parquet source prunes on —
  * deterministic pruning with no reliance on runtime DPP heuristics.
  *
  * Equivalence contract (the q_dedup_incr_store treatment): probing ALL
  * cells routes every (query, corpus) pair through assignment → cell →
  * exact-cosine rerank exactly once, so the stored-index result provably
  * equals [[Similarity.ivfTopK]] recomputed on the raw corpus — and
  * equals the exact brute-force top-k — whatever the k-means draw.
  * Centroids round-trip parquet as exact doubles, so assignment is
  * bit-identical between build time and probe time.
  */
object AnnStore {

  /** Train an IVF quantizer on `corpus` (bounded sample — see
    * [[IvfIndex.build]]), assign every vector, and persist both halves.
    * One full-corpus scan; the assignment expression is codegen'd
    * ([[graft.plans.NearestCentroidsExpr]]), so the scan stays in
    * WholeStageCodegen.
    */
  def write(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nLists: Int = 16, seed: Long = 42): IvfIndex = {
    val spark = corpus.sparkSession
    val idx = IvfIndex.build(corpus, vecCol, nLists, seed = seed)
    import scala.jdk.CollectionConverters._
    val centRows = idx.centroids.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i, c.toSeq)
    }
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        nullable = false)))
    spark.createDataFrame(centRows.toSeq.asJava, centSchema)
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    assignWith(corpus, idCol, vecCol, idx)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/corpus.parquet")
    idx
  }

  /** Load the coarse quantizer back (nLists rows — driver-side by
    * design, like the quantizer itself).
    */
  def readIndex(spark: SparkSession, dir: String): IvfIndex = {
    val rows = spark.read.parquet(s"$dir/centroids.parquet")
      .orderBy("cell").collect()
    require(rows.nonEmpty, s"AnnStore: no centroids at $dir")
    IvfIndex(rows.map(_.getSeq[Double](1).toArray))
  }

  /** Assign a DELTA of new vectors with the STORED centroids and append
    * its rows into the cell partitions — the daily-ingest path: the
    * existing corpus is never re-read, never re-encoded, and the index
    * stays probe-consistent (same quantizer) without retraining. Callers
    * own id uniqueness across appends, as with any ingest.
    */
  def append(delta: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    val idx = readIndex(delta.sparkSession, dir)
    assignWith(delta, idCol, vecCol, idx)
      .write.mode("append").partitionBy("cell").parquet(s"$dir/corpus.parquet")
  }

  /** Top-k cosine neighbors from the stored index: queries assign to
    * their nProbe nearest stored centroids, the probed cells prune the
    * corpus scan at the partition level, and exact cosine ranks the
    * survivors (identical ranking contract to the rest of the ANN
    * family: row_number over (cosine desc, n_id)).
    */
  def probe(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nProbe: Int = 4): DataFrame = {
    import graft.GraftCaches.PersistOps
    val idx = readIndex(spark, dir)
    val probes = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("cell", explode(nearestCells(col("q_vec"), idx, nProbe)))
      .graftPersist // feeds the tiny distinct-cells collect AND the join
    // static partition pruning: <= nLists distinct cells whatever the
    // query count, planted as an isin literal on the partition column
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val stored = spark.read.parquet(s"$dir/corpus.parquet")
      .where(col("cell").isin(cells: _*))
      .select(col("cell"), col("id").as("n_id"), col("vec").as("n_vec"))
    stored.join(broadcast(probes), Seq("cell"))
      .withColumn("cosine", Dedup.cosineExact(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))))
      .where(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cosine")
  }

  /** (id, vec, cell) with the codegen'd nearest-centroid assignment. */
  private def assignWith(df: DataFrame, idCol: String, vecCol: String,
      idx: IvfIndex): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cell", nearestCells(col("vec"), idx, 1)(0))

  private def nearestCells(vec: org.apache.spark.sql.Column, idx: IvfIndex,
      take: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.NearestCentroidsExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec.cast("array<float>")),
        idx.centroids, take))
}
