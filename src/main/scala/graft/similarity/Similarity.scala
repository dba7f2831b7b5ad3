package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.6).
  *
  * Scale design: `bruteForceTopK` is exact and correct whenever the QUERY
  * set is small — the corpus is scanned once and the query side is
  * broadcast, so cost is O(|corpus| * |queries|) with no corpus shuffle.
  * For corpus-sized query sets use `lshTopK`: hyperplane-LSH buckets cut
  * the candidate set, trading recall (spec-measured) for a bucket-join
  * plan that scales linearly.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) table — scanned once, never shuffled
    *                until the per-query top-k window.
    * @param queries small (idCol, vecCol) table — broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c.crossJoin(q)
      .withColumn("cosine", Dedup.cosineExact(col("q_vec"), col("n_vec")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))))
      .where(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cosine")
  }

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus
    * into nLists cells; each query probes its nProbe nearest cells and
    * ranks candidates by exact cosine. The classic trade: one-off train +
    * assign cost, then every query touches only nProbe/nLists of the
    * corpus — the right ANN shape when the corpus is re-queried many times.
    *
    * The quantizer is an [[IvfIndex]]: trained once on a BOUNDED sample
    * (never the full corpus — at 100 TB a full-corpus fit per query call
    * is an ML job, not a lookup) and reusable across calls. Pass a
    * pre-built index for repeated querying; when omitted, one is
    * sample-fit on the spot.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10,
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 42,
      index: Option[IvfIndex] = None): DataFrame = {
    val idx = index.getOrElse(IvfIndex.cached(corpus, vecCol, nLists, seed = seed))
    val centroids = idx.centroids

    // centroids are tiny (nLists x dim): closed over into the assign /
    // probe UDFs — the corpus-side assignment is a narrow codegen'd map,
    // no MLlib vector conversion and no shuffle.
    def nearestUdf(take: Int) = udf { (v: Seq[Float]) =>
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        val n = math.min(c.length, v.length)
        while (j < n) { val t = c(j) - v(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1).take(take).map(_._2)
    }
    val assigned = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("cell", nearestUdf(1)(col("n_vec"))(0))
    val probes = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("cell", explode(nearestUdf(nProbe)(col("q_vec")))))

    assigned.join(probes, Seq("cell"))
      .withColumn("cosine", Dedup.cosineExact(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))))
      .where(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cosine")
  }

  /** LSH-bucketed ANN: candidates are corpus vectors sharing at least one
    * signature band with the query; exact cosine ranks within candidates.
    * Recall vs bruteForceTopK is measured in LshAnnSpec.
    *
    * Only (id, band_idx, band_val) enters the candidate join and its
    * dedup exchange — vectors join back by id afterwards (corpus vectors
    * cross the wire once per candidate doc; query vectors ride a
    * broadcast). Letting vectors ride the ×numBands band explode was the
    * dominant shuffle width at scale.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int = 10,
      sigBits: Int = 16, bandBits: Int = 4, seed: Int = 42): DataFrame = {
    val sig = Dedup.planeSigUdf(dim, sigBits, seed)
    val numBands = sigBits / bandBits

    def banded(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), sig(col(vecCol)).as("sig"))
        .select(col(id),
          explode(array((0 until numBands).map(i =>
            struct(lit(i).as("band_idx"),
              shiftrightunsigned(col("sig"), i * bandBits)
                .bitwiseAND(lit((1 << bandBits) - 1)).as("band_val"))): _*)).as("b"))
        .select(col(id), col("b.band_idx"), col("b.band_val"))

    val qb = broadcast(banded(queries, "q_id"))
    val cb = banded(corpus, "n_id")
    val candidates = cb.join(qb, Seq("band_idx", "band_val"))
      .select("q_id", "n_id")
      .dropDuplicates("q_id", "n_id")
    candidates
      .join(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")), Seq("n_id"))
      .join(broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))), Seq("q_id"))
      .withColumn("cosine", Dedup.cosineExact(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))))
      .where(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cosine")
  }
}
