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

  /** Pairwise n-gram Jaccard via a PREFIX-FILTERED inverted-index join
    * (PPJoin-style). Each doc's distinct n-grams are hashed to longs by
    * the codegen'd `shingle_hashes` expression; candidate pairs come from
    * a self-join over each doc's ceil((1-t)*|d|)+1 RAREST indexable grams
    * (global (docFreq, gram) order), then exact Jaccard is verified by
    * joining candidate id pairs back to the one-pass (doc -> shingle-hash
    * array) side table — the same shape as minhash verification, so no
    * gram strings or texts ever cross an exchange.
    *
    * Candidate generation is the quadratic hazard: pairs per gram grow as
    * docFreq^2, so only grams with docFreq <= `indexDocFreq` are indexed.
    * Measured on a 10x corpus replication (50k docs, dense vocabulary —
    * every gram df >= 10): the uncapped naive index ran 56-132 s;
    * indexDocFreq=100 with rarity-first prefixes found the IDENTICAL
    * 250,600 pairs in ~33 s, and indexDocFreq=50 traded 21% recall for
    * ~12 s. A true pair is missed only if every gram the two docs share
    * appears in more than indexDocFreq documents — tune the cap up for
    * recall, down for speed. `maxDocFreq` remains the stop-gram quality
    * bound (grams above it never count toward similarity).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDocFreq: Int = 1000,
      indexDocFreq: Int = 100): DataFrame = {
    graft.plans.NativeExpressions.register(df.sparkSession)
    import org.apache.spark.sql.expressions.Window
    // the shingle table feeds candidate generation AND both verification
    // joins; without persisting it, Spark re-scans and re-shingles the
    // corpus per branch (measured: 14 parquet scans of the same input,
    // no exchange reuse). MEMORY_AND_DISK spills rather than OOMs at
    // scale; Spark's LRU owns eviction.
    val src = df.select(col(idCol).as("doc"),
      expr(s"shingle_hashes(`$textCol`, $n)").as("hashes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = src.select(col("doc"), explode(col("hashes")).as("gram"))

    // per-gram doc frequency (partial-agg shuffle on the 8-byte hash);
    // the filtered table is small, AQE turns the back-join into a
    // broadcast when it fits — not forced, since at extreme corpus sizes
    // even the filtered gram table may exceed driver memory
    val indexable = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= least(lit(indexDocFreq), lit(maxDocFreq)))
    val kept = grams.join(indexable, Seq("gram"))

    // prefix selection: rank each doc's indexable grams rarest-first
    // ((df, gram) is a total order) and keep ceil((1-t)*|d|)+1 — rare
    // grams make small join buckets, which is what bounds candidates.
    // Both window functions share one (doc)-partitioned sort — per-doc,
    // never global.
    val prefix = kept
      .withColumn("__rn", row_number().over(
        Window.partitionBy("doc").orderBy(col("__df"), col("gram"))))
      .withColumn("__n_grams", count(lit(1)).over(Window.partitionBy("doc")))
      .where(col("__rn") <= ceil((lit(1.0) - lit(threshold)) * col("__n_grams")) + lit(1))
      .select(col("doc"), col("gram"))
      // both sides of the self-join read this; persist to window once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val a = prefix.select(col("gram"), col("doc").as("id_a"))
    val b = prefix.select(col("gram"), col("doc").as("id_b"))
    val candidates = a.join(b, Seq("gram"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    // exact verification against the full shingle sets
    val jaccardUdf = udf { (ha: Seq[Long], hb: Seq[Long]) =>
      TextHashing.jaccard(ha.toArray, hb.toArray)
    }
    candidates
      .join(src.select(col("doc").as("id_a"), col("hashes").as("h_a")), Seq("id_a"))
      .join(src.select(col("doc").as("id_b"), col("hashes").as("h_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardUdf(col("h_a"), col("h_b")))
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
