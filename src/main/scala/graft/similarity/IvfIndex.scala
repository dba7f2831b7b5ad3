package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Coarse quantizer for IVF ANN: nLists centroids trained once and reused
  * across query calls.
  *
  * Scale design: the quantizer is fit on a BOUNDED reservoir of corpus
  * vectors (`sampleSize`, default 64k) pulled with one distributed sample,
  * then clustered driver-locally with seeded k-means++ / Lloyd's — the
  * standard IVF recipe (cf. faiss: quantizers train on an in-memory
  * sample). Training cost is therefore independent of corpus size; at
  * 100 TB the build is one cheap sampling scan, and the index itself is a
  * few KB of centroids that broadcast for free.
  */
final case class IvfIndex(centroids: Array[Array[Double]]) {
  def nLists: Int = centroids.length
}

object IvfIndex {

  /** Train on a bounded sample of `corpus.vecCol` (array&lt;float&gt; or
    * array&lt;double&gt;). Deterministic for a fixed seed. The effective
    * sample is additionally capped at ~2048 points per centroid (faiss's
    * guidance: beyond a few hundred points per centroid, more training
    * data stops improving the quantizer).
    */
  def build(corpus: DataFrame, vecCol: String, nLists: Int = 16,
      sampleSize: Int = 65536, maxIter: Int = 10, seed: Long = 42): IvfIndex = {
    val cap = math.min(sampleSize, math.max(nLists * 2048, 4096))
    val vecs = corpus.select(col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull && size(col("v")) > 0)
    // Small-corpus fast path: one limit job (reads only the first few
    // partitions). Only when the corpus exceeds the cap do we pay the
    // count + seeded-sample scans for an unbiased draw — at that scale the
    // build is amortized across queries (see `cached`).
    val first = vecs.limit(cap + 1).collect()
    val rows =
      if (first.length <= cap) first
      else {
        val total = vecs.count()
        val frac = math.min(1.0, cap.toDouble * 1.2 / total)
        vecs.sample(withReplacement = false, frac, seed).limit(cap).collect()
      }
    val sample = rows.map(_.getSeq[Double](0).toArray)
    IvfIndex(localKMeans(sample, nLists, maxIter, seed))
  }

  // Quantizers are tiny and corpus-stable: memoize per (canonicalized
  // corpus plan, column, nLists, seed) so repeated ivfTopK calls over the
  // same corpus skip the sampling scan entirely. Keyed on the FULL
  // canonicalized plan string + schema (a 32-bit hashCode could collide
  // across corpora and silently serve the wrong centroids); rewriting the
  // underlying files under an identical plan would need an explicit
  // `clearCache()`.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Int, Long), IvfIndex]()

  def cached(corpus: DataFrame, vecCol: String, nLists: Int = 16,
      sampleSize: Int = 65536, seed: Long = 42): IvfIndex = {
    val planKey = corpus.queryExecution.logical.canonicalized.toString +
      "|" + corpus.schema.catalogString
    val key = (planKey, vecCol, nLists, sampleSize, seed)
    if (cache.size > 64) cache.clear()
    cache.computeIfAbsent(key,
      _ => build(corpus, vecCol, nLists, sampleSize, seed = seed))
  }

  def clearCache(): Unit = cache.clear()

  /** Seeded k-means++ init + Lloyd's iterations over the in-memory sample.
    * O(sampleSize * nLists * dim * maxIter) on the driver — microseconds
    * to low milliseconds per iteration at the default sizes.
    */
  private[graft] def localKMeans(points: Array[Array[Double]], k: Int,
      maxIter: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "IvfIndex: empty training sample")
    val rnd = new scala.util.Random(seed)
    val n = points.length
    val kk = math.min(k, n)

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { val t = a(i) - b(i); d += t * t; i += 1 }
      d
    }

    // k-means++ seeding: next center sampled proportional to D^2
    val centers = new Array[Array[Double]](kk)
    centers(0) = points(rnd.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var i = 0
      var sum = 0.0
      while (i < n) {
        val d = dist2(points(i), centers(c - 1))
        if (d < d2(i)) d2(i) = d
        sum += d2(i); i += 1
      }
      var r = rnd.nextDouble() * sum
      var pick = 0
      i = 0
      while (i < n && r > 0) { r -= d2(i); if (r > 0) pick = math.min(i + 1, n - 1); i += 1 }
      centers(c) = points(pick).clone()
      c += 1
    }

    // Lloyd's: assign + recompute until stable or maxIter
    val assign = new Array[Int](n)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < kk) {
          val d = dist2(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        if (assign(i) != best) { assign(i) = best; moved = true }
        i += 1
      }
      if (moved) {
        val dim = points(0).length
        val sums = Array.fill(kk)(new Array[Double](dim))
        val counts = new Array[Int](kk)
        i = 0
        while (i < n) {
          val a = assign(i); val p = points(i)
          var j = 0
          while (j < math.min(dim, p.length)) { sums(a)(j) += p(j); j += 1 }
          counts(a) += 1; i += 1
        }
        var j = 0
        while (j < kk) {
          if (counts(j) > 0) {
            var m = 0
            while (m < dim) { sums(j)(m) /= counts(j); m += 1 }
            centers(j) = sums(j)
          } // empty cluster keeps its previous center
          j += 1
        }
      }
      iter += 1
    }
    centers
  }
}
