package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (SURVEY §2.6).
  *
  * Design for 100 TB: every variant is a hash-partitioned shuffle on a
  * digest/bucket key — never an O(n²) comparison. Candidate generation is
  * LSH-style blocking (band buckets) followed by exact verification only
  * within buckets; oversized buckets (degenerate content, e.g. empty docs)
  * are capped to bound worst-case skew.
  */
object Dedup {

  /** Drop rows whose bucket (the `keys` combination) exceeds `cap` rows.
    * Implemented as a partial-agg count + broadcast anti-join of the
    * (tiny) oversized-key list — NOT a window count, which would sort
    * every exploded partition at 100 TB. Oversized buckets are degenerate
    * content; dropping them is both the skew guard and a quality filter.
    */
  private[graft] def dropOversizedBuckets(df: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val oversized = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .where(col("__bucket_n") > cap)
      .select(keys.map(col): _*)
    df.join(broadcast(oversized), keys, "left_anti")
  }

  // ---------- exact ----------

  /** Exact dedup by content digest: md5 of (optionally normalized) text.
    * Returns one row per distinct digest: the keeper (min id) + dup count.
    * Map-side partial aggregation keeps the shuffle small; the digest is a
    * codegen'd builtin, so this whole op is one WholeStageCodegen + one
    * exchange on the digest.
    */
  def exact(df: DataFrame, idCol: String, textCol: String, normalize: Boolean = true): DataFrame = {
    val t = if (normalize) lower(trim(col(textCol))) else col(textCol)
    df.select(col(idCol), md5(t).as("digest"))
      .groupBy("digest")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("dup_count"))
  }

  /** Keep-first filter form: drops all but the min-id row per digest.
    * Implemented as a min-aggregate + semi-join (not a window over the full
    * table, which would sort within every partition).
    */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String, normalize: Boolean = true): DataFrame = {
    val keepers = exact(df, idCol, textCol, normalize).select(col("keep_id").as(idCol))
    df.join(keepers, Seq(idCol), "left_semi")
  }

  // ---------- minhash + LSH ----------

  final case class MinHashConfig(
      shingleSize: Int = 3,
      numPerms: Int = 64,
      numBands: Int = 16,
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000,
      seed: Int = 42) {
    require(numPerms % numBands == 0, "numPerms must divide into numBands")
    def rowsPerBand: Int = numPerms / numBands
  }

  /** Near-duplicate pairs via MinHash + LSH banding.
    *
    * Stages (each a narrow map or one keyed shuffle — the scale path):
    *  1. signature: one codegen'd pass/doc -> 64 minhashes -> 16 band hashes;
    *  2. posexplode (doc, band_idx, band_hash) ONLY — document text never
    *     enters the band shuffle (at 100 TB, carrying text would push ~16×
    *     the corpus through one exchange);
    *  3. oversized buckets dropped (skew cap, degenerate-content guard);
    *  4. candidate id pairs join back to a once-computed (doc ->
    *     shingle-hash array) side table for exact Jaccard verification —
    *     shingles cross the wire once per doc, not once per candidate pair,
    *     and no re-shingling happens on the pair path.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    // signature+banding runs as a native codegen'd expression (no UDF
    // encoder round-trip on the per-document hot path)
    graft.plans.NativeExpressions.register(df.sparkSession)
    val src = df.select(col(idCol).as("doc"), col(textCol).as("txt"))
    val bands = expr(
      s"minhash_bands(txt, ${cfg.shingleSize}, ${cfg.numPerms}, ${cfg.numBands}, ${cfg.seed})")
    val banded = src.select(col("doc"),
      posexplode(bands).as(Seq("band_idx", "band_hash")))

    val bucketed = dropOversizedBuckets(banded, Seq("band_idx", "band_hash"), cfg.maxBucketSize)

    val a = bucketed.select(col("band_idx"), col("band_hash"), col("doc").as("id_a"))
    val b = bucketed.select(col("band_idx"), col("band_hash"), col("doc").as("id_b"))
    val candidates = a.join(b, Seq("band_idx", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    // one pass over the corpus -> (doc, distinct shingle hashes); candidate
    // pairs fetch both sides via two id-keyed joins
    val shingles = src.select(col("doc"),
      expr(s"shingle_hashes(txt, ${cfg.shingleSize})").as("hashes"))
    val jaccardUdf = udf { (ha: Seq[Long], hb: Seq[Long]) =>
      TextHashing.jaccard(ha.toArray, hb.toArray)
    }
    candidates
      .join(shingles.select(col("doc").as("id_a"), col("hashes").as("h_a")), Seq("id_a"))
      .join(shingles.select(col("doc").as("id_b"), col("hashes").as("h_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardUdf(col("h_a"), col("h_b")))
      .where(col("jaccard") >= cfg.threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Greedy keep-first dedup from near-dup pairs: drop every doc that
    * appears as the larger id of a confirmed pair.
    */
  def dropNearDups(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  // ---------- simhash ----------

  /** Near-duplicate pairs via 64-bit SimHash with 16-bit band blocking.
    * Two docs within `maxHamming` differing bits share at least one of the
    * four 16-bit bands (pigeonhole, maxHamming <= 3), so blocking on band
    * values finds all such pairs with one keyed shuffle. Verification is
    * Spark's native bit_count(a ^ b) — codegen'd, no UDF on the hot pair path.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    graft.plans.NativeExpressions.register(df.sparkSession)
    val sigs = df.select(col(idCol).as("doc"),
      expr(s"simhash64(`$textCol`)").as("sig"))
    val banded = sigs.select(col("doc"), col("sig"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("band_idx"),
            shiftrightunsigned(col("sig"), i * 16).bitwiseAND(lit(0xffffL)).as("band_val"))): _*)).as("b"))
      .select(col("doc"), col("sig"), col("b.band_idx"), col("b.band_val"))
    val capped = dropOversizedBuckets(banded, Seq("band_idx", "band_val"), maxBucketSize)

    val a = capped.select(col("band_idx"), col("band_val"), col("doc").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band_idx"), col("band_val"), col("doc").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---------- n-gram jaccard (inverted index join) ----------

  /** Pairwise n-gram Jaccard via an inverted-index join — no UDF anywhere:
    * each doc's distinct n-grams are hashed to longs by the codegen'd
    * `shingle_hashes` expression (8-byte join keys instead of gram strings
    * — severalfold narrower shuffle at 100 TB), self-joined on the gram
    * hash (one keyed shuffle), common grams counted per pair,
    * |A∩B| / |A∪B| computed from per-doc gram counts taken via
    * `size(array)` (no extra groupBy shuffle).
    * `maxDocFreq` drops stop-grams (appearing in too many docs) — both a
    * quality and a skew guard at scale.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDocFreq: Int = 1000): DataFrame = {
    graft.plans.NativeExpressions.register(df.sparkSession)
    val src = df.select(col(idCol).as("doc"),
      expr(s"shingle_hashes(`$textCol`, $n)").as("hashes"))
    val sizes = src.select(col("doc"), size(col("hashes")).as("n_grams"))
    val grams = src.select(col("doc"), explode(col("hashes")).as("gram"))
    // stop-gram drop via agg + broadcast anti-join (no sort of the full
    // exploded gram set — see dropOversizedBuckets)
    val filtered = dropOversizedBuckets(grams, Seq("gram"), maxDocFreq)

    val a = filtered.select(col("gram"), col("doc").as("id_a"))
    val b = filtered.select(col("gram"), col("doc").as("id_b"))
    val common = a.join(b, Seq("gram"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))

    common
      .join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("n_grams", "na"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("n_grams", "nb"), Seq("id_b"))
      .withColumn("jaccard", col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------- embedding cosine near-dup ----------

  /** Random-hyperplane LSH signature (sign-bit of dot with seeded planes). */
  private[graft] def planeSigUdf(dim: Int, bits: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits, dim)(rnd.nextGaussian())
    udf { (v: Seq[Float]) =>
      var sig = 0
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        val p = planes(b)
        val n = math.min(v.length, dim)
        while (i < n) { dot += p(i) * v(i); i += 1 }
        if (dot > 0) sig |= (1 << b)
        b += 1
      }
      sig
    }
  }

  /** Exact cosine over float-vector columns, computed in double with
    * codegen'd higher-order functions (deterministic fold order).
    */
  def cosineExact(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(ad, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(bd, lit(0.0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Embedding near-dup pairs: hyperplane-LSH blocking (bandBits-bit bands)
    * then exact cosine verification within buckets.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.9, sigBits: Int = 16, bandBits: Int = 8,
      seed: Int = 42, maxBucketSize: Int = 10000): DataFrame = {
    val sig = planeSigUdf(dim, sigBits, seed)
    val numBands = sigBits / bandBits
    val sigs = df.select(col(idCol).as("doc"), col(vecCol).as("vec"))
      .withColumn("sig", sig(col("vec")))
    val banded = sigs.select(col("doc"), col("vec"),
        explode(array((0 until numBands).map(i =>
          struct(lit(i).as("band_idx"),
            shiftrightunsigned(col("sig"), i * bandBits)
              .bitwiseAND(lit((1 << bandBits) - 1)).as("band_val"))): _*)).as("b"))
      .select(col("doc"), col("vec"), col("b.band_idx"), col("b.band_val"))
    val capped = dropOversizedBuckets(banded, Seq("band_idx", "band_val"), maxBucketSize)

    val a = capped.select(col("band_idx"), col("band_val"), col("doc").as("id_a"), col("vec").as("vec_a"))
    val b = capped.select(col("band_idx"), col("band_val"), col("doc").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosineExact(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
