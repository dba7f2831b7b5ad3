package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftCaches.PersistOps

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
    // r22 note: an isEmpty probe that skips the anti-join when no bucket
    // exceeds the cap was A/B'd and REJECTED — the probe runs the count
    // aggregate as a serial job BEFORE the query, while the lazy form
    // folds it into the AQE DAG where it overlaps other stages (4-query
    // cohort: lazy 2.77 s, probe 3.20 s, hard-skip floor 2.38 s).
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
    // src feeds BOTH derived caches (banded + shingles); persisting it
    // means the corpus parquet is scanned once per query, not once per
    // derived table. MEMORY_AND_DISK: text-sized, spills, LRU-evictable
    // (eviction degrades to a rescan, never an error).
    val src = df.select(col(idCol).as("doc"), col(textCol).as("txt"))
      .graftPersist
    val bands = expr(
      s"minhash_bands(txt, ${cfg.shingleSize}, ${cfg.numPerms}, ${cfg.numBands}, ${cfg.seed})")
    // banded feeds the oversized-bucket subquery AND both sides of the
    // candidate self-join; Spark reuses no subplans across self-joins, so
    // without the persist the corpus is re-scanned and re-signatured 4x
    // (measured: 7 parquet scans per query). Same treatment as ngram.
    val banded = src.select(col("doc"),
      posexplode(bands).as(Seq("band_idx", "band_hash")))
      .graftPersist

    val bucketed = dropOversizedBuckets(banded, Seq("band_idx", "band_hash"), cfg.maxBucketSize)

    val a = bucketed.select(col("band_idx"), col("band_hash"), col("doc").as("id_a"))
    val b = bucketed.select(col("band_idx"), col("band_hash"), col("doc").as("id_b"))
    val candidates = a.join(b, Seq("band_idx", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    // one pass over the corpus -> (doc, distinct shingle hashes); candidate
    // pairs fetch both sides via two id-keyed joins (persisted: it feeds
    // both verification joins)
    val shingles = src.select(col("doc"),
      expr(s"shingle_hashes(txt, ${cfg.shingleSize})").as("hashes"))
      .graftPersist
    candidates
      .join(shingles.select(col("doc").as("id_a"), col("hashes").as("h_a")), Seq("id_a"))
      .join(shingles.select(col("doc").as("id_b"), col("hashes").as("h_b")), Seq("id_b"))
      .withColumn("jaccard", expr("jaccard_long(h_a, h_b)"))
      .where(col("jaccard") >= cfg.threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** INCREMENTAL near-dup pairing: the daily-ingest shape — pair a NEW
    * batch (`delta`) against the standing corpus AND itself, without ever
    * pairing corpus×corpus. The candidate join probes delta bands against
    * all bands, so the quadratic term scales with the delta's bucket
    * overlap, not the corpus size; at 100 TB the corpus side costs one
    * signature pass (and in production those signatures are precomputed
    * and stored — this recomputes them for self-containment).
    *
    * Equivalence contract: returns exactly the pairs a FULL
    * [[minHashPairs]] run over corpus ∪ delta would return, restricted to
    * pairs touching at least one delta doc — including identical
    * bucket-cap behavior (the cap is applied to the union's buckets).
    */
  def incrementalMinHashPairs(corpus: DataFrame, delta: DataFrame,
      idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    graft.plans.NativeExpressions.register(corpus.sparkSession)
    val srcAll = corpus
      .select(col(idCol).as("doc"), col(textCol).as("txt"), lit(false).as("is_delta"))
      .unionByName(delta.select(col(idCol).as("doc"), col(textCol).as("txt"),
        lit(true).as("is_delta")))
      .graftPersist
    val bands = expr(
      s"minhash_bands(txt, ${cfg.shingleSize}, ${cfg.numPerms}, ${cfg.numBands}, ${cfg.seed})")
    val banded = srcAll.select(col("doc"), col("is_delta"),
      posexplode(bands).as(Seq("band_idx", "band_hash")))
      .graftPersist
    val capped = dropOversizedBuckets(banded, Seq("band_idx", "band_hash"), cfg.maxBucketSize)
    val probe = capped.where(col("is_delta"))
      .select(col("band_idx"), col("band_hash"), col("doc").as("d"))
    val build = capped.select(col("band_idx"), col("band_hash"), col("doc").as("o"))
    val candidates = probe.join(build, Seq("band_idx", "band_hash"))
      .where(col("d") =!= col("o"))
      .select(least(col("d"), col("o")).as("id_a"),
        greatest(col("d"), col("o")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val shingles = srcAll.select(col("doc"),
      expr(s"shingle_hashes(txt, ${cfg.shingleSize})").as("hashes"))
      .graftPersist
    candidates
      .join(shingles.select(col("doc").as("id_a"), col("hashes").as("h_a")), Seq("id_a"))
      .join(shingles.select(col("doc").as("id_b"), col("hashes").as("h_b")), Seq("id_b"))
      .withColumn("jaccard", expr("jaccard_long(h_a, h_b)"))
      .where(col("jaccard") >= cfg.threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SIGNATURE STORE for incremental dedup — the production shape
    * [[incrementalMinHashPairs]]'s docstring promises: compute the
    * corpus's band signatures and shingle-hash arrays ONCE and persist
    * them, so daily deltas never re-signature the standing corpus.
    *
    * Layout: `path/bands` = (doc, band_idx, band_hash), range-partitioned
    * and sorted on (band_idx, band_hash) so parquet min/max stats give
    * every band-bucket probe file-level locality (the same layout trick
    * as [[graft.operators.ScaleOps.zorderWrite]], exact here because the
    * sort key IS the probe key); `path/shingles` = (doc, hashes) for the
    * verify joins, keyed by doc. Pass `SaveMode.Append` from a daily job
    * to fold each verified delta into the store.
    */
  def writeSignatures(corpus: DataFrame, idCol: String, textCol: String,
      path: String, cfg: MinHashConfig = MinHashConfig(),
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.Overwrite): Unit = {
    graft.plans.NativeExpressions.register(corpus.sparkSession)
    val src = corpus.select(col(idCol).as("doc"), col(textCol).as("txt"))
      .graftPersist // one text scan feeds both derived tables
    src.select(col("doc"), posexplode(expr(
        s"minhash_bands(txt, ${cfg.shingleSize}, ${cfg.numPerms}, ${cfg.numBands}, ${cfg.seed})"))
        .as(Seq("band_idx", "band_hash")))
      .repartitionByRange(col("band_idx"), col("band_hash"))
      .sortWithinPartitions("band_idx", "band_hash")
      .write.mode(mode).parquet(s"$path/bands")
    src.select(col("doc"),
        expr(s"shingle_hashes(txt, ${cfg.shingleSize})").as("hashes"))
      .write.mode(mode).parquet(s"$path/shingles")
  }

  /** Incremental near-dup pairing against a persisted signature store:
    * same result contract as [[incrementalMinHashPairs]] (pairs a full
    * run over corpus ∪ delta would emit restricted to delta-touching,
    * identical union-bucket cap behavior — the stored signatures are the
    * same deterministic expressions a recompute would produce), but the
    * corpus cost drops from a full text re-signature to a scan of the
    * narrow (doc, band_idx, band_hash) table; only the DELTA is
    * signatured. The corpus text is never read at all.
    *
    * Envelope: the touched-bucket-keys semi-join is a BroadcastHashJoin
    * only while the delta's distinct (band_idx, band_hash) set fits
    * `broadcastTouchedBytes` (default 512 MiB ≈ 2M keys at the
    * conservative 256 B/row build-side estimate — a ~130k-doc delta at 16
    * bands); a larger daily delta degrades to a
    * shuffle left_semi on the same keys instead of OOMing the driver
    * (the [[nGramJaccardPairs]] `broadcastVerifyBytes` pattern; result
    * identical either way — the store's range-partitioned layout still
    * prunes row groups, the join just exchanges instead of broadcasting).
    */
  def incrementalFromStore(delta: DataFrame, storePath: String,
      idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig(),
      broadcastTouchedBytes: Long = 512L << 20): DataFrame = {
    val spark = delta.sparkSession
    graft.plans.NativeExpressions.register(spark)
    val dsrc = delta.select(col(idCol).as("doc"), col(textCol).as("txt"))
      .graftPersist
    val deltaBands = dsrc.select(col("doc"), lit(true).as("is_delta"),
        posexplode(expr(
          s"minhash_bands(txt, ${cfg.shingleSize}, ${cfg.numPerms}, ${cfg.numBands}, ${cfg.seed})"))
          .as(Seq("band_idx", "band_hash")))
      .graftPersist // delta-sized; feeds touched-keys, cap count + probe
    // candidate pairs only arise in buckets the DELTA touches, and the
    // bucket cap is irrelevant for buckets without a delta row — so the
    // store scan is semi-joined down to delta-touched bucket keys before
    // anything else. The broadcast is delta-sized, and because the store
    // is range-partitioned + sorted on exactly (band_idx, band_hash),
    // parquet min/max stats prune untouched row groups: the corpus band
    // table is READ in proportion to the delta, not the corpus.
    val touched = deltaBands.select("band_idx", "band_hash").distinct().graftPersist
    // 256 B/key: the raw (int, long) UnsafeRow is ~32 B, but a broadcast
    // build side ALSO pays the driver-side collect copy, the serialized
    // broadcast blob, and the HashedRelation map (key array + page table)
    // simultaneously — several multiples of the row bytes. The estimate is
    // deliberately conservative because the failure mode it gates is a
    // driver OOM and the fallback (shuffle left_semi) is result-identical
    // (ADVICE r11 — 48 B/key undercounted the hashed-relation overhead).
    // Counting the persisted delta-derived table is delta-cost, never
    // corpus-cost.
    val touchedBytes = touched.count() * 256L
    val touchedKeyed =
      if (touchedBytes <= broadcastTouchedBytes) broadcast(touched) else touched
    val banded = spark.read.parquet(s"$storePath/bands")
      .select(col("doc"), lit(false).as("is_delta"), col("band_idx"), col("band_hash"))
      .unionByName(deltaBands)
      .join(touchedKeyed, Seq("band_idx", "band_hash"), "left_semi")
    // cap counts over the union's (touched) buckets — identical behavior
    // to the recompute path for every bucket that can produce a pair
    val capped = dropOversizedBuckets(banded, Seq("band_idx", "band_hash"), cfg.maxBucketSize)
    val probe = capped.where(col("is_delta"))
      .select(col("band_idx"), col("band_hash"), col("doc").as("d"))
    val build = capped.select(col("band_idx"), col("band_hash"), col("doc").as("o"))
    val candidates = probe.join(build, Seq("band_idx", "band_hash"))
      .where(col("d") =!= col("o"))
      .select(least(col("d"), col("o")).as("id_a"),
        greatest(col("d"), col("o")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val shingles = spark.read.parquet(s"$storePath/shingles")
      .unionByName(dsrc.select(col("doc"),
        expr(s"shingle_hashes(txt, ${cfg.shingleSize})").as("hashes")))
    candidates
      .join(shingles.select(col("doc").as("id_a"), col("hashes").as("h_a")), Seq("id_a"))
      .join(shingles.select(col("doc").as("id_b"), col("hashes").as("h_b")), Seq("id_b"))
      .withColumn("jaccard", expr("jaccard_long(h_a, h_b)"))
      .where(col("jaccard") >= cfg.threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Greedy keep-first dedup from near-dup pairs: drop every doc that
    * appears as the larger id of a confirmed pair.
    */
  def dropNearDups(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Connected components over a near-dup pair graph: (node, label) with
    * label = min node id in the component. Pairwise output alone
    * over-deletes under greedy rules (a~b, b~c but a!~c still forms one
    * duplicate GROUP that must keep exactly one survivor) — production
    * dedup resolves pairs into components first.
    *
    * Distributed min-label propagation: per iteration one edge⋈label join
    * + one min-aggregate (labels only ever decrease; convergence when no
    * label changed). Near-dup components are star-like (tiny diameter),
    * so 3-5 iterations typically converge; `maxIter` bounds adversarial
    * chains. Shuffles carry only (long, long) rows — no text, no arrays.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 20): DataFrame = {
    // The LOOP runs on pair RDDs, not DataFrames — the one place in this
    // engine where RDDs win. Every iteration of the DataFrame formulation
    // paid Catalyst analysis + optimization + AQE stage re-planning on a
    // freshly built (identical-shaped) plan: ~0.25 s/round of pure
    // driver-side latency at any data size, × O(log diameter) rounds
    // (measured r9; neither lazy checkpoints, AQE toggles, partition
    // sizing, nor extra jump terms moved it). Spark's own iterative-graph
    // library (GraphX) is RDD-based for exactly this reason. The loop
    // carries only (long, long) pairs: co-partitioned edge⋈label joins
    // are narrow (zero per-round edge shuffle), reduceByKey map-side
    // combines, and per-round localCheckpoint truncates lineage. For
    // multi-node deployments, registering Kryo shrinks the tuple shuffle;
    // the volume is 16 bytes/record of payload either way.
    val spark = pairs.sparkSession
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    val ccDebug = sys.env.contains("GRAFT_CC_DEBUG")
    val edgeRdd = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    // Symmetrize, then co-partition on the message key once: ~2M edges per
    // partition ((long,long) rows) stays far under executor memory while
    // scaling out with the graph (1B edges -> 500 partitions).
    val symRaw = edgeRdd.flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = symRaw.count()
    val part = new HashPartitioner(
      math.max(1L, math.min(edgeCount / 2000000L + 1, 20000L)).toInt)
    val sym = symRaw.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    // Convergence probe: labels only ever DECREASE, so the total label sum
    // is strictly decreasing until the fixed point — an unchanged sum is
    // exactly "no label changed". BigInt per-partition sums keep it exact
    // at any node count (a raw long sum could overflow at billions of
    // 2^40-scale ids). The probe action doubles as the materializer of
    // each round's lazily-localCheckpoint'd labels: ONE job per round.
    def labelSum(r: org.apache.spark.rdd.RDD[(Long, Long)]): BigInt =
      r.mapPartitions { it =>
        var s = BigInt(0); it.foreach(s += _._2); Iterator.single(s)
      }.fold(BigInt(0))(_ + _)
    // seed with the one-hop minimum (saves a full propagation round);
    // mapPartitions(preservesPartitioning) keeps hash(node) co-location
    var labels = sym.reduceByKey(part, math.min(_, _))
      .mapPartitions(_.map { case (n, m) => (n, math.min(n, m)) },
        preservesPartitioning = true)
    labels.localCheckpoint()
    var prevSum = labelSum(labels)
    symRaw.unpersist(blocking = false)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val iterT0 = System.nanoTime()
      // min over (self, neighbors' labels, label-of-label): the neighbor
      // term walks the graph, the pointer-jump term halves the remaining
      // propagation depth each round — O(log diameter) rounds for chains
      // instead of O(diameter)
      val nbr = sym.join(labels, part) // narrow: both sides hash(key)-partitioned
        .map { case (_, (u, l)) => (u, l) }
      val jump = labels.map { case (n, l) => (l, n) }
        .join(labels, part) // labels side narrow; re-keyed side shuffles
        .map { case (_, (n, ll)) => (n, ll) }
      val next = (labels ++ nbr ++ jump).reduceByKey(part, math.min(_, _))
      next.localCheckpoint() // lazy; materialized by the probe below
      val nextSum = labelSum(next)
      if (ccDebug) println(f"CC_DEBUG iter=$iter wall=${(System.nanoTime() - iterT0) / 1e9}%.3f s")
      labels.unpersist(blocking = false)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    sym.unpersist(blocking = false)
    import spark.implicits._
    labels.toDF("node", "label")
  }

  /** Cluster-resolved dedup: keep exactly one document (the min id) per
    * connected duplicate component; singletons pass through untouched.
    */
  def dropByComponents(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val doomed = connectedComponents(pairs, aCol, bCol)
      .where(col("node") =!= col("label"))
      .select(col("node").cast("long").as(idCol))
    df.join(doomed, Seq(idCol), "left_anti")
  }

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
    // persisted for the same reason as minHashPairs: the bucket-cap
    // subquery + both self-join sides would otherwise re-scan the corpus
    val banded = sigs.select(col("doc"), col("sig"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("band_idx"),
            shiftrightunsigned(col("sig"), i * 16).bitwiseAND(lit(0xffffL)).as("band_val"))): _*)).as("b"))
      .select(col("doc"), col("sig"), col("b.band_idx"), col("b.band_val"))
      .graftPersist
    val capped = dropOversizedBuckets(banded, Seq("band_idx", "band_val"), maxBucketSize)

    val a = capped.select(col("band_idx"), col("band_val"), col("doc").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band_idx"), col("band_val"), col("doc").as("id_b"), col("sig").as("sig_b"))
    // hamming-verify BEFORE the pair dedup: the filter is codegen'd
    // arithmetic fused into the join's output stage, so the
    // dropDuplicates exchange carries only TRUE pairs (hamming is a pure
    // function of the sigs — identical for every band that rediscovers a
    // pair). At high maxHamming the bands are narrow and candidates
    // outnumber true pairs by orders of magnitude (r8: this exchange was
    // the q_image_neardup bench floor).
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "hamming")
  }

  /** Image near-dup pairs via perceptual hashing: each image folds to a
    * 64-bit dHash ([[graft.multimodal.BinaryOps.dHash64]]) at decode time
    * — 8 bytes per image enter the plan, never pixels — then the same
    * pigeonhole band blocking as [[simHashPairs]] finds candidates:
    * `maxHamming + 1` contiguous bit-ranges of the signature (two hashes
    * within `maxHamming` bits MUST agree on at least one whole band), a
    * bucket cap bounds degenerate content (e.g. solid-color images), and
    * the exact popcount verifies. Returns (id_a, id_b, hamming).
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 6, maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, s"maxHamming out of range: $maxHamming")
    val nBands = maxHamming + 1
    val offsets = (0 to nBands).map(i => i * 64 / nBands)
    val sigs = graft.multimodal.BinaryOps
      .imageDHash(df.select(col(idCol).as("doc"), col(binCol)), binCol, "sig")
      .where(col("sig").isNotNull)
      .select(col("doc"), col("sig"))
    val banded = sigs.select(col("doc"), col("sig"),
        explode(array((0 until nBands).map(i =>
          struct(lit(i).as("band_idx"),
            shiftrightunsigned(col("sig"), offsets(i))
              .bitwiseAND(lit((1L << (offsets(i + 1) - offsets(i))) - 1)).as("band_val"))): _*)).as("b"))
      .select(col("doc"), col("sig"), col("b.band_idx"), col("b.band_val"))
      .graftPersist
    val capped = dropOversizedBuckets(banded, Seq("band_idx", "band_val"), maxBucketSize)

    val a = capped.select(col("band_idx"), col("band_val"), col("doc").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band_idx"), col("band_val"), col("doc").as("id_b"), col("sig").as("sig_b"))
    // hamming-verify BEFORE the pair dedup: the filter is codegen'd
    // arithmetic fused into the join's output stage, so the
    // dropDuplicates exchange carries only TRUE pairs (hamming is a pure
    // function of the sigs — identical for every band that rediscovers a
    // pair). At high maxHamming the bands are narrow and candidates
    // outnumber true pairs by orders of magnitude (r8: this exchange was
    // the q_image_neardup bench floor).
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
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
    * A true pair is missed only if every gram the two docs share appears
    * in more than indexDocFreq documents — tune the cap up for recall,
    * down for speed. `maxDocFreq` bounds CANDIDATE GENERATION only (grams
    * above it are never indexed); verification computes exact Jaccard
    * over the FULL shingle sets, so a reported pair's score always equals
    * the true n-gram Jaccard of the two documents.
    *
    * Verification is the byte-volume hazard: a dense corpus yields far
    * more candidates than true pairs (measured on a 10x sf0.1 corpus
    * replication, 50k docs, every gram df >= 10: 17.3M candidates ->
    * 250,600 true pairs), and pair-keyed SortMergeJoins against the
    * multi-KB shingle arrays exchange AND sort candidates x array-bytes
    * (~50 GB at that point; measured 266 s of a ~300 s run — the round-5
    * regression). The verify therefore semi-joins the array table down to
    * candidate-touched docs and, when that subset fits
    * `broadcastVerifyBytes` (default 1 GiB), runs two
    * BroadcastHashJoins with `jaccard_long` + the PPJoin length filter
    * fused into one codegen stage over streaming candidate rows —
    * measured: the same 10x point in 24 s, identical pairs. Larger
    * verify sets degrade to the shuffle shape with the narrow (doc,
    * size) length pre-filter.
    *
    * Below `prefixMinDocs` documents the prefix machinery is skipped for a
    * count-aggregate join: the full df-capped index self-joins and one
    * (id_a, id_b) count aggregation yields the EXACT intersection size for
    * pairs of fully-indexed docs, so jaccard needs no per-pair array
    * verification at all (the per-doc rarity sort only pays for itself
    * once bucket sizes — not fixed per-query overhead — dominate;
    * measured: count-aggregate wins up to ~10k docs, prefix is 4x faster
    * at 50k).
    *
    * EAGER AT BUILD TIME (documented SURVEY §4 exception): on the
    * large-corpus path a one-row aggregate over the candidate-touched
    * docs (bounded by 2x candidate count) is read on the driver to pick
    * broadcast vs shuffle verification — so this operator cannot compose
    * onto an unstarted streaming DataFrame and executes its upstream at
    * call time. See SURVEY §4's exception list and HygieneSpec's
    * eager-site allowlist.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDocFreq: Int = 1000,
      indexDocFreq: Int = 100, prefixMinDocs: Int = 10000,
      broadcastVerifyBytes: Long = 1L << 30): DataFrame = {
    graft.plans.NativeExpressions.register(df.sparkSession)
    import org.apache.spark.sql.expressions.Window
    // the shingle table feeds candidate generation AND both verification
    // joins; without persisting it, Spark re-scans and re-shingles the
    // corpus per branch (measured: 14 parquet scans of the same input,
    // no exchange reuse). MEMORY_AND_DISK spills rather than OOMs at
    // scale; Spark's LRU owns eviction.
    val src = df.select(col(idCol).as("doc"),
      expr(s"shingle_hashes(`$textCol`, $n)").as("hashes"))
      .graftPersist
    val grams = src.select(col("doc"), explode(col("hashes")).as("gram"))

    // per-gram doc frequency (partial-agg shuffle on the 8-byte hash);
    // the filtered table is small, AQE turns the back-join into a
    // broadcast when it fits — not forced, since at extreme corpus sizes
    // even the filtered gram table may exceed driver memory
    val dfCap = least(lit(indexDocFreq), lit(maxDocFreq))
    val gramDfs = grams.select("gram").groupBy("gram").agg(count(lit(1)).as("__df"))
    val indexable = gramDfs.where(col("__df") <= dfCap)

    // the probe doubles as the one materialization pass of the persisted
    // shingle table (both paths consume all of src immediately after)
    val nDocs = src.count()

    if (nDocs <= prefixMinDocs) {
      // Stop-gram probe (r22, guide §2.4 "remove shuffles outright"): when
      // NO gram exceeds the df cap — the common case for small corpora,
      // where the cap exists to bound pathological inputs, not to fire —
      // `indexable` is ALL grams, every doc is fully indexed, and the
      // fallback branch below is provably empty. One tiny aggregate probe
      // then replaces: the indexable back-join + its persisted cache, the
      // per-doc __n_idx join, the fullyIndexed split, the two fallback
      // broadcasts and the union (measured: 10 fewer jobs/rep, q_dedup_ngram
      // 1.83 -> see OPTIMIZATION_r22.md). Data-derived plan choice computed
      // in-query from this run's input, like the nDocs branch above.
      val hasStopGrams = !gramDfs.where(col("__df") > dfCap).isEmpty
      if (!hasStopGrams) {
        val a = grams.select(col("gram"), col("doc").as("id_a")).hint("shuffle_hash")
        val b = grams.select(col("gram"), col("doc").as("id_b"))
        val stats = broadcast(src.select(col("doc"),
          size(col("hashes")).cast("long").as("__n_tot")))
        return a.join(b, Seq("gram"))
          .where(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("__common"))
          .join(stats.select(col("doc").as("id_a"), col("__n_tot").as("__na")), Seq("id_a"))
          .join(stats.select(col("doc").as("id_b"), col("__n_tot").as("__nb")), Seq("id_b"))
          .withColumn("jaccard",
            col("__common") / (col("__na") + col("__nb") - col("__common")))
          .where(col("jaccard") >= threshold)
          .select("id_a", "id_b", "jaccard")
      }
      // ---- small-corpus path: count-aggregate join ----
      // For a pair whose docs are BOTH fully indexed (every gram df <= cap),
      // the per-pair match count from the gram self-join IS the exact
      // intersection size, so jaccard = common / (|a| + |b| - common) falls
      // out of one narrow (id_a, id_b) aggregation — no per-pair array
      // join, no UDF. Only pairs touching a partially-indexed doc (one
      // with a stop-gram) fall back to full-array verification. Measured
      // at sf0.1 this replaced a 1.1M-candidate dropDuplicates + two
      // array joins (the r2 regression) with one count shuffle.
      // Broadcasts below are doc-count-bounded (corpus <= prefixMinDocs),
      // hence safe by construction on this branch.
      val narrow = grams.join(broadcast(indexable), Seq("gram"))
        .select(col("doc"), col("gram"))
        .graftPersist
      val a = narrow.select(col("gram"), col("doc").as("id_a")).hint("shuffle_hash")
      val b = narrow.select(col("gram"), col("doc").as("id_b"))
      val common = a.join(b, Seq("gram"))
        .where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("__common"))
        // feeds the exact branch and the (near-empty) fallback branch
        .graftPersist
      val stats = broadcast(
        src.select(col("doc"), size(col("hashes")).cast("long").as("__n_tot"))
          .join(narrow.groupBy("doc").agg(count(lit(1)).as("__n_idx")), Seq("doc"), "left")
          .na.fill(0L, Seq("__n_idx")))
      val withStats = common
        .join(stats.select(col("doc").as("id_a"), col("__n_tot").as("__na"), col("__n_idx").as("__ia")), Seq("id_a"))
        .join(stats.select(col("doc").as("id_b"), col("__n_tot").as("__nb"), col("__n_idx").as("__ib")), Seq("id_b"))
      val fullyIndexed = col("__ia") === col("__na") && col("__ib") === col("__nb")
      val exactPairs = withStats.where(fullyIndexed)
        .withColumn("jaccard",
          col("__common") / (col("__na") + col("__nb") - col("__common")))
        .where(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
      val fallbackPairs = withStats.where(!fullyIndexed)
        .select("id_a", "id_b")
        .join(broadcast(src.select(col("doc").as("id_a"), col("hashes").as("h_a"))), Seq("id_a"))
        .join(broadcast(src.select(col("doc").as("id_b"), col("hashes").as("h_b"))), Seq("id_b"))
        .withColumn("jaccard", expr("jaccard_long(h_a, h_b)"))
        .where(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
      exactPairs.unionAll(fallbackPairs)
    } else {
      // ---- large-corpus path: PPJoin prefix filter ----
      // rank each doc's indexable grams rarest-first ((df, gram) is a
      // total order) and keep ceil((1-t)*|d|)+1 — rare grams make small
      // join buckets, which is what bounds candidates. One
      // (doc)-partitioned sort — per-doc, never global. The count trick
      // above doesn't apply (prefix match counts undercount the true
      // intersection), so candidates verify against the full shingle sets.
      // The indexable back-join is NOT force-broadcast here: at extreme
      // corpus sizes even the df-capped gram table may exceed driver
      // memory; AQE broadcasts it when it fits.
      val kept = grams.join(indexable, Seq("gram"))
      // prefix length is relative to the doc's INDEXED gram count — the
      // similarity the index can see is over indexed grams, and the dense
      // stop-gram-heavy corpora this path serves make the full-size prefix
      // ~40% longer for no recall gain (measured: 35 s -> 55 s at 10x).
      // The per-doc count is a cheap partial aggregate whose result is
      // one row per doc — AQE broadcasts the back-join, so no window
      // count pass and no extra exchange (the r2 regression).
      val nIdx = kept.groupBy("doc").agg(count(lit(1)).as("__n_idx"))
      val index = kept.join(nIdx, Seq("doc"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("doc").orderBy(col("__df"), col("gram"))))
        .where(col("__rn") <= ceil((lit(1.0) - lit(threshold)) * col("__n_idx")) + lit(1))
        .select(col("doc"), col("gram"))
        // both sides of the self-join read this; persist to compute once
        .graftPersist

      val a = index.select(col("gram"), col("doc").as("id_a"))
      val b = index.select(col("gram"), col("doc").as("id_b"))
      // candidates feed the verify plan twice (the docs-touched semi-join
      // probe below + the verify join itself); persisted, they are a
      // narrow (long, long) table
      val candidates = a.join(b, Seq("gram"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")
        .graftPersist

      // Verification strategy. A dense corpus can yield 50-100x more
      // candidates than true pairs (measured at 10x sf0.1: 17.3M
      // candidates -> 250,600 pairs), so joining the multi-KB shingle
      // arrays through pair-keyed shuffles is the scale killer: each
      // SortMergeJoin exchanges AND sorts (pairs x array-bytes) — ~50 GB
      // at 10x, measured 266 of the path's ~300 s. Instead: reduce the
      // array table to the candidate-TOUCHED docs (semi-join — bounded by
      // 2x candidate count regardless of corpus size), and if that subset
      // fits a broadcast, verify with two BroadcastHashJoins — arrays
      // cross the wire once per executor, jaccard_long + the PPJoin
      // length filter run inside one codegen stage over the streaming
      // candidate rows (measured: the 10x point drops ~255 s -> ~35 s).
      // Oversized verify sets degrade to the shuffle shape with the
      // length pre-filter on narrow (doc, size) tables.
      val docsTouched = candidates
        .select(explode(array(col("id_a"), col("id_b"))).as("doc")).distinct()
      val varr = src.join(docsTouched, Seq("doc"), "left_semi").graftPersist
      val vstats = varr.agg(count(lit(1)), coalesce(sum(size(col("hashes"))), lit(0L))).head()
      val vbytes = vstats.getLong(1) * 8L + vstats.getLong(0) * 32L
      val sizeOk = least(size(col("h_a")), size(col("h_b"))).cast("double") >=
        lit(threshold) * greatest(size(col("h_a")), size(col("h_b"))).cast("double")
      if (vbytes <= broadcastVerifyBytes) {
        candidates
          .join(broadcast(varr.select(col("doc").as("id_a"), col("hashes").as("h_a"))), Seq("id_a"))
          .join(broadcast(varr.select(col("doc").as("id_b"), col("hashes").as("h_b"))), Seq("id_b"))
          .where(sizeOk) // cheap length cut before the merge-scan jaccard
          .withColumn("jaccard", expr("jaccard_long(h_a, h_b)"))
          .where(col("jaccard") >= threshold)
          .select("id_a", "id_b", "jaccard")
      } else {
        // PPJoin length filter on narrow (doc, size) tables BEFORE the
        // array joins: jaccard(a,b) <= min|a|,|b| / max|a|,|b|
        val sizes = varr.select(col("doc"), size(col("hashes")).cast("long").as("__sz"))
        candidates
          .join(sizes.select(col("doc").as("id_a"), col("__sz").as("__sa")), Seq("id_a"))
          .join(sizes.select(col("doc").as("id_b"), col("__sz").as("__sb")), Seq("id_b"))
          .where(least(col("__sa"), col("__sb")) >=
            lit(threshold) * greatest(col("__sa"), col("__sb")))
          .select("id_a", "id_b")
          .join(varr.select(col("doc").as("id_a"), col("hashes").as("h_a")), Seq("id_a"))
          .join(varr.select(col("doc").as("id_b"), col("hashes").as("h_b")), Seq("id_b"))
          .withColumn("jaccard", expr("jaccard_long(h_a, h_b)"))
          .where(col("jaccard") >= threshold)
          .select("id_a", "id_b", "jaccard")
      }
    }
  }

  // ---------- C4 three-sentence-span dedup ----------

  /** Corpus-level exact dedup of three-sentence spans — the C4 recipe's
    * final step (Raffel et al. 2020 §2.2: "we discarded all but one of
    * any three-sentence span occurring more than once in the data set"),
    * complementing [[graft.text.TextAnalysis.c4Flags]]'s page rules.
    *
    * Distributed shape (narrow-key shuffles only — document text never
    * enters an exchange):
    *  1. one projection/doc: sentence split + sliding `spanSentences`
    *     windows hashed to 64-bit (`xxhash64`) — codegen'd;
    *  2. winner per span hash = global min (doc, span_idx) via one
    *     partial-agg shuffle on the 8-byte hash;
    *  3. duplicate span occurrences expand to a per-doc removed-sentence-
    *     index ARRAY (ids + small ints only — rows exist only for docs
    *     that actually contain a duplicated span);
    *  4. that small table broadcasts back onto the persisted sentence
    *     arrays, and each doc rebuilds IN PLACE with codegen'd
    *     `filter`/`array_join` — no explode/regroup, the text column
    *     stays in its scan partitions.
    *
    * The broadcast payload is bounded by (#docs with a duplicated span) ×
    * (avg removed indexes) ints — orders of magnitude narrower than the
    * corpus; if a pathological corpus ever outgrew the driver, the same
    * join degrades to a shuffle join by dropping the hint, trading one
    * 1× text exchange for it.
    *
    * Returns (doc, n_sentences, n_removed, clean_text). Docs with fewer
    * than `spanSentences` sentences pass through unchanged.
    */
  def c4SpanDedup(df: DataFrame, idCol: String, textCol: String,
      spanSentences: Int = 3): DataFrame = {
    // sentence boundary: whitespace following terminal punctuation
    // (Java-regex lookbehind — Spark's split keeps the punctuation)
    val sentences = df.select(col(idCol).as("doc"),
      split(col(textCol), "(?<=[.!?])\\s+").as("sents"))
      .graftPersist

    val nSpans = greatest(size(col("sents")) - (spanSentences - 1), lit(0))
    val spans = sentences
      .where(size(col("sents")) >= spanSentences)
      .select(col("doc"), posexplode(transform(
        sequence(lit(0), nSpans - 1),
        i => xxhash64(concat_ws("", (0 until spanSentences).map(k =>
          element_at(col("sents"), (i + k + 1).cast("int"))): _*))))
        .as(Seq("span_idx", "span_hash")))

    // winner per hash: global first occurrence (min doc, then min idx)
    val winners = spans.groupBy("span_hash")
      .agg(min(struct(col("doc"), col("span_idx"))).as("keep"),
        count(lit(1)).as("__n"))
      .where(col("__n") > 1)
    val dupSpans = spans.join(winners, Seq("span_hash"))
      .where(!(col("doc") === col("keep.doc") && col("span_idx") === col("keep.span_idx")))
      .select(col("doc"), col("span_idx"))

    // per-doc removed sentence indexes, deduped inside the aggregate —
    // one narrow shuffle of (doc, int) rows, arrays of ints out
    val removedIdx = dupSpans
      .select(col("doc"), explode(sequence(col("span_idx"),
        col("span_idx") + (spanSentences - 1))).as("sent_idx"))
      .groupBy("doc")
      .agg(array_sort(array_distinct(collect_list(col("sent_idx")))).as("removed_idx"))

    // rebuild in place: broadcast the small removed-index table onto the
    // persisted sentence arrays and filter with codegen'd HOFs — the
    // sentence text never leaves its partitions
    sentences.join(broadcast(removedIdx), Seq("doc"), "left")
      .select(col("doc"), size(col("sents")).cast("int").as("n_sentences"),
        coalesce(
          when(col("removed_idx").isNotNull,
            filter(col("sents"), (_, i) => !array_contains(col("removed_idx"), i)))
            .otherwise(col("sents")),
          array().cast("array<string>")).as("kept"),
        coalesce(size(col("removed_idx")), lit(0)).cast("int").as("n_removed"))
      .select(col("doc"), col("n_sentences"),
        size(col("kept")).cast("int").as("n_kept_sentences"),
        col("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  // ---------- substring (suffix-array-style) dedup ----------

  /** Corpus-level removal of long duplicated token substrings — the
    * suffix-array dedup of Lee et al. 2021 ("Deduplicating Training Data
    * Makes Language Models Better": drop substrings of >= minLen tokens
    * that occur more than once), re-expressed distribution-first. A
    * monolithic suffix array over 100 TB is not partitionable; instead
    * candidates come from winnowing fingerprints (Schleimer et al. 2003),
    * whose guarantee replaces the suffix array's completeness: any
    * duplicated run of >= w + k - 1 = minLen tokens shares at least one
    * content-defined anchor across both occurrences regardless of
    * alignment.
    *
    * Stages (text never enters a wide exchange — same shape as
    * [[c4SpanDedup]]):
    *  1. one codegen'd pass/doc: ordered token hashes + winnow anchors
    *     (`token_hashes` / `winnow_anchors`, ~n/w anchors per doc);
    *  2. anchors shuffle as (doc, pos, hash8B); winner per hash = global
    *     min (doc, pos), occurrences of duplicated anchors join back
    *     hash-keyed (ids only). Anchor hashes duplicated across more than
    *     `maxBucketSize` docs are degenerate boilerplate — dropped (skew
    *     cap, same policy as the LSH families);
    *  3. extension verify: loser/winner token-hash ARRAYS (longs, not
    *     text) meet by id-keyed joins; the codegen'd `extend_match` grows
    *     the anchor to the maximal common run; runs shorter than minLen
    *     are discarded. Same-doc matches clip to remove only the
    *     non-overlapping tail (periodic text removes the repetition, keeps
    *     one period);
    *  4. removal ranges aggregate to a small per-doc int-pair array that
    *     broadcasts onto the persisted token table; docs rebuild IN PLACE
    *     with codegen'd `filter`/`array_join`.
    *
    * Output is token-normalized ((lowercased, punctuation-split) tokens
    * joined by spaces — the working representation of this dedup family),
    * one row per input doc: (doc, n_tokens, n_removed_tokens, clean_text).
    */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
      minLen: Int = 50, k: Int = 10, maxBucketSize: Int = 1000): DataFrame = {
    require(minLen >= k, s"minLen ($minLen) must be >= k ($k)")
    graft.plans.NativeExpressions.register(df.sparkSession)
    val w = minLen - k + 1

    // one tokenization pass; toks (strings, for rebuild) stay co-located
    // with tokh (hashes, for verify) in the persisted scan partitions
    val toks = filter(split(lower(col(textCol)), "\\W+"), t => length(t) > lit(0))
    val src = df.select(col(idCol).as("doc"), toks.as("toks"),
      expr(s"token_hashes(`$textCol`)").as("tokh"))
      .graftPersist

    // anchors scan the source once more (narrow: text in, 12 B rows out);
    // positions index the same token sequence as toks/tokh — both sides
    // tokenize as lowercase-split-on-\W+
    val anchors = df.select(col(idCol).as("doc"),
      explode(expr(s"winnow_anchors(`$textCol`, $k, $w)")).as("a"))
      .select(col("doc"), col("a.pos").as("pos"), col("a.hash").as("hash"))
      .graftPersist

    val winners = anchors.groupBy("hash")
      .agg(min(struct(col("doc"), col("pos"))).as("keep"), count(lit(1)).as("__n"))
      .where(col("__n") > 1 && col("__n") <= maxBucketSize)
    val cand = anchors.join(winners, Seq("hash"))
      .where(!(col("doc") === col("keep.doc") && col("pos") === col("keep.pos")))
      .select(col("doc"), col("pos"),
        col("keep.doc").as("w_doc"), col("keep.pos").as("w_pos"))

    // id-keyed verify joins carry token-hash arrays only (8 B/token)
    val paired = cand
      .join(src.select(col("doc"), col("tokh").as("tok_l")), Seq("doc"))
      .join(src.select(col("doc").as("w_doc"), col("tokh").as("tok_w")), Seq("w_doc"))
      .withColumn("m", expr(s"extend_match(tok_l, pos, tok_w, w_pos, $k)"))
      .select(col("doc"), col("pos"), col("w_doc"), col("w_pos"),
        element_at(col("m"), 1).as("s0"), element_at(col("m"), 2).as("len"))
      .where(col("len") >= minLen)
      .withColumn("e", col("s0") + col("len"))
      // same-doc runs: remove only past the winner occurrence's run end
      // (rb in loser coords = e - (pos - w_pos)), so one period of a
      // repetition always survives
      .withColumn("s", when(col("doc") === col("w_doc"),
        greatest(col("s0"), col("e") - (col("pos") - col("w_pos"))))
        .otherwise(col("s0")))
      .where(col("e") > col("s"))

    val ranges = paired.groupBy("doc")
      .agg(collect_set(struct(col("s"), col("e"))).as("cut"))

    src.join(broadcast(ranges), Seq("doc"), "left")
      .select(col("doc"), size(col("toks")).cast("int").as("n_tokens"),
        when(col("cut").isNotNull,
          filter(col("toks"), (_, i) =>
            !exists(col("cut"), r => i >= r.getField("s") && i < r.getField("e"))))
          .otherwise(col("toks")).as("kept"))
      .select(col("doc"), col("n_tokens"),
        size(col("kept")).cast("int").as("n_kept_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("int").as("n_removed_tokens"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  // ---------- embedding cosine near-dup ----------

  /** Random-hyperplane LSH signature column (sign-bit of dot with seeded
    * planes) — the native codegen'd `plane_sig` expression
    * ([[graft.plans.PlaneSigExpr]]); the caller's session must have
    * [[graft.plans.NativeExpressions.register]] applied.
    */
  private[graft] def planeSig(vecCol: String, dim: Int, bits: Int, seed: Int): Column =
    expr(s"plane_sig(`$vecCol`, $dim, $bits, $seed)")

  /** Exact cosine over vector columns, computed in double with a native
    * codegen'd expression (deterministic ascending-index fold order —
    * bit-identical to the zip_with/aggregate formulation it replaces,
    * whose per-element interpreted lambda eval dominated the 10^8-pair
    * verification joins at 100x scale; see
    * [[graft.plans.NativeExpressions]] CosineSimExpr).
    */
  def cosineExact(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.CosineSimExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Embedding near-dup pairs: hyperplane-LSH blocking (bandBits-bit bands)
    * then exact cosine verification within buckets.
    *
    * The band shuffle carries only (doc, band_idx, band_val) — at 100 TB
    * with KB-sized vectors, letting vectors ride the band explode would
    * multiply the dominant exchange width by numBands. Candidate id pairs
    * join the vectors back by id for the cosine verify, so each vector
    * crosses the wire once per doc, not once per band or candidate.
    *
    * EAGER AT BUILD TIME (documented SURVEY §4 exception): this operator
    * runs a bounded driver action when CALLED — the banded table is
    * persisted and a 2-row scalar over the (band_idx, band_val) count
    * aggregate (key domain ≤ numBands·2^bandBits, 512 at the defaults)
    * picks the oversized-bucket drop and the slice short-circuit. So it
    * cannot be composed onto an unstarted streaming DataFrame, and calling
    * it executes everything upstream of `df` immediately, not at sink
    * time. The measured win (SCALE_r15 `lsh_shortcircuit_sf10`: no-skew at
    * the unsliced floor, planted skew faster than every uniform-slicing
    * row) is what buys that trade.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.9, sigBits: Int = 16, bandBits: Int = 8,
      seed: Int = 42, maxBucketSize: Int = 10000, sliceFactor: Int = 32,
      sliceRows: Int = 2048): DataFrame = {
    require(sliceFactor >= 1,
      s"sliceFactor must be >= 1 (got $sliceFactor): the a-side explodes " +
        "over (0 until slices), so 0 would silently drop every candidate pair")
    require(sliceRows >= 1, s"sliceRows must be >= 1 (got $sliceRows)")
    graft.plans.NativeExpressions.register(df.sparkSession)
    val numBands = sigBits / bandBits
    val vecs = df.select(col(idCol).as("doc"), col(vecCol).as("vec"))
    val banded = vecs.withColumn("sig", planeSig("vec", dim, sigBits, seed))
      .select(col("doc"),
        explode(array((0 until numBands).map(i =>
          struct(lit(i).as("band_idx"),
            shiftrightunsigned(col("sig"), i * bandBits)
              .bitwiseAND(lit((1 << bandBits) - 1)).as("band_val"))): _*)).as("b"))
      .select(col("doc"), col("b.band_idx"), col("b.band_val"))
      .graftPersist
    // One bucket-count aggregate serves BOTH the oversized-bucket drop and
    // the adaptive slice factor (r14 computed it twice over the same keys —
    // ADVICE r14). The key domain is numBands·2^bandBits (512 at the
    // defaults), so `counts` is bounded by the domain, not the corpus, and
    // the one-row stats agg over it is a driver-safe scalar read.
    val counts = banded.groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("__bn")).graftPersist
    val stats = counts.agg(
      sum(when(col("__bn") > maxBucketSize, 1L).otherwise(0L)).as("n_over"),
      max(when(col("__bn") <= maxBucketSize, col("__bn"))).as("max_kept")).head()
    val nOversized = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val maxKept = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    // branch decisions, named once: `capped` references counts iff a
    // bucket is oversized; the candidates plan references it iff slicing
    // engages — the unpersist below derives from THESE so an edit to
    // either predicate can't desynchronize it
    val countsInCappedPlan = nOversized != 0L
    val countsInSlicePlan = maxKept > sliceRows
    val capped =
      if (!countsInCappedPlan) banded
      else banded.join(
        broadcast(counts.where(col("__bn") > maxBucketSize)
          .select("band_idx", "band_val")),
        Seq("band_idx", "band_val"), "left_anti")

    // Slice the within-bucket self-join ADAPTIVELY (r13 sliced, r14 made
    // it size-proportional, r15 short-circuits the common case). Unlike
    // minhash, whose band keys are 64-bit hashes, this join's key domain
    // is numBands·2^bandBits (512 at the defaults) — so one near-cap
    // bucket's quadratic pair grid (cap²/2 pairs) can land on ONE task
    // however wide the cluster. r13 replicated EVERY bucket across a
    // uniform sliceFactor, which SlicePoint measured as a 1.54× end-to-end
    // pessimization at sf10 (97.5 → 150.1 s): the fixture's buckets are
    // far below the cap, pair generation was already balanced across the
    // 512 keys, and the uniform 32× a-side replication tripled the
    // candidate join's task time (321 → 1054 s). So slicing is per-bucket:
    // S = ceil(bucket_n / sliceRows) capped at sliceFactor — buckets at or
    // below sliceRows (the common case) get S=1 and pay NOTHING; only a
    // genuinely oversized bucket replicates, and only enough to split its
    // own pair grid. When NO kept bucket exceeds sliceRows (max_kept above,
    // a scalar off the same aggregate), the size join and sequence-explode
    // are skipped entirely and the join runs on the bare band keys — the
    // unsliced plan. Each member otherwise gets a deterministic slice
    // s ∈ [0,S); the a-side replicates once per target slice, the b-side
    // keeps its own, and joining on (band, val, slice_b) preserves every
    // pair exactly once. The candidate SET is unchanged in every branch —
    // slicing is pure parallelization, so results (and the replayed
    // oracle) are bit-identical.
    val candidates = (if (!countsInSlicePlan) {
      capped.select(col("band_idx"), col("band_val"), col("doc").as("id_a"))
        .join(capped.select(col("band_idx"), col("band_val"), col("doc").as("id_b")),
          Seq("band_idx", "band_val"))
    } else {
      val withS = capped.join(broadcast(counts), Seq("band_idx", "band_val"))
        .withColumn("__S", least(lit(sliceFactor), greatest(lit(1),
          ceil(col("__bn").cast("double") / sliceRows).cast("int"))))
      val a = withS
        .withColumn("slice_b", explode(sequence(lit(0), col("__S") - 1)))
        .select(col("band_idx"), col("band_val"), col("slice_b"), col("doc").as("id_a"))
      val b = withS.select(col("band_idx"), col("band_val"),
        pmod(xxhash64(col("doc")), col("__S").cast("long")).cast("int").as("slice_b"),
        col("doc").as("id_b"))
      a.join(b, Seq("band_idx", "band_val", "slice_b"))
    })
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    // On the common short-circuit path `counts` served only the scalar
    // stats read and nothing in the candidates plan references it — drop
    // its blocks now instead of waiting for the host's scope release
    // (ADVICE r15). The other branches keep it cached for their lazy
    // anti-join / slice-factor joins; scope release reclaims it there.
    if (!countsInCappedPlan && !countsInSlicePlan) counts.unpersist()

    candidates
      .join(vecs.select(col("doc").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vecs.select(col("doc").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .withColumn("cosine", cosineExact(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
