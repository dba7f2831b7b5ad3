package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with planted duplicates: 10/11 near-identical, 20/21 identical
  private def docs = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (11L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (20L, "spark shuffles data between executors during wide transformations always"),
    (21L, "spark shuffles data between executors during wide transformations always"),
    (30L, "completely unrelated content about cooking pasta with garlic and olive oil"),
    (40L, "another standalone document discussing quantum error correction codes")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical digests, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 5) // 20/21 collapse
    val dup = out.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 20L)
    val kept = Dedup.exactKeepFirst(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(10L, 11L, 20L, 30L, 40L))
  }

  test("minHashPairs finds planted near-dup and exact-dup, not unrelated docs") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
      Dedup.MinHashConfig(threshold = 0.5)).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((10L, 11L)), s"missing near-dup pair, got $pairSet")
    assert(pairSet.contains((20L, 21L)))
    assert(!pairSet.exists { case (a, b) => Set(a, b).intersect(Set(30L, 40L)).nonEmpty })
    val jac = pairs.find(r => r.getLong(0) == 20L).get.getAs[Double]("jaccard")
    assert(jac == 1.0)
  }

  test("incrementalMinHashPairs: delta-touching pairs only, full-run equivalent") {
    // corpus holds a planted corpus-corpus pair (10/11) that must NOT be
    // re-reported; the delta brings a cross pair (12~10/11) and a
    // delta-delta pair (50/51)
    val corpus = docs
    val delta = Seq(
      (12L, "the quick brown fox jumps over the lazy dog near the river bank forever"),
      (50L, "gradient descent updates model weights using minibatch statistics nightly"),
      (51L, "gradient descent updates model weights using minibatch statistics daily"),
      (60L, "totally fresh content with no relatives anywhere in the lake"))
      .toDF("doc_id", "text")
    val cfg = Dedup.MinHashConfig(threshold = 0.5)
    val got = Dedup.incrementalMinHashPairs(corpus, delta, "doc_id", "text", cfg)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.contains((10L, 11L)), s"corpus-corpus pair re-reported: $got")
    assert(!got.contains((20L, 21L)))
    assert(got.contains((50L, 51L)), s"missing delta-delta pair: $got")
    assert(got.exists { case (a, b) => b == 12L || a == 12L }, s"missing cross pair: $got")
    // equivalence: full run over the union, filtered to delta-touching
    val deltaIds = Set(12L, 50L, 51L, 60L)
    val full = Dedup.minHashPairs(corpus.unionByName(delta), "doc_id", "text", cfg)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => deltaIds(a) || deltaIds(b) }.toSet
    assert(got === full)
  }

  test("incrementalFromStore: store path equals the recompute path; corpus text never read") {
    val corpus = docs
    val delta = Seq(
      (12L, "the quick brown fox jumps over the lazy dog near the river bank forever"),
      (50L, "gradient descent updates model weights using minibatch statistics nightly"),
      (51L, "gradient descent updates model weights using minibatch statistics daily"),
      (60L, "totally fresh content with no relatives anywhere in the lake"))
      .toDF("doc_id", "text")
    val cfg = Dedup.MinHashConfig(threshold = 0.5)
    val store = java.nio.file.Files.createTempDirectory("graft-sigstore").toString
    Dedup.writeSignatures(corpus, "doc_id", "text", store, cfg)
    val fromStore = Dedup.incrementalFromStore(delta, store, "doc_id", "text", cfg)
    // the plan reads the two store parquet tables, never the corpus rows
    val scans = fromStore.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.nonEmpty, "expected parquet scans of the signature store")
    val got = fromStore.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recompute = Dedup.incrementalMinHashPairs(corpus, delta, "doc_id", "text", cfg)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === recompute, "store path must equal the recompute path")
    assert(got.contains((50L, 51L)) && got.exists { case (a, b) => a == 12L || b == 12L })
    // daily-ingest append: folding the verified delta into the store makes
    // the NEXT delta see it as corpus
    Dedup.writeSignatures(delta, "doc_id", "text", store, cfg,
      org.apache.spark.sql.SaveMode.Append)
    val next = Seq((70L, "gradient descent updates model weights using minibatch statistics weekly"))
      .toDF("doc_id", "text")
    val nextPairs = Dedup.incrementalFromStore(next, store, "doc_id", "text", cfg)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nextPairs.exists { case (a, b) => b == 70L && (a == 50L || a == 51L) },
      s"appended delta signatures must be probeable: $nextPairs")
  }

  test("incrementalFromStore: over-budget touched set degrades to shuffle semi-join, same pairs") {
    val corpus = docs
    val delta = Seq(
      (12L, "the quick brown fox jumps over the lazy dog near the river bank forever"),
      (50L, "gradient descent updates model weights using minibatch statistics nightly"),
      (51L, "gradient descent updates model weights using minibatch statistics daily"))
      .toDF("doc_id", "text")
    val cfg = Dedup.MinHashConfig(threshold = 0.5)
    val store = java.nio.file.Files.createTempDirectory("graft-sigstore-gate").toString
    Dedup.writeSignatures(corpus, "doc_id", "text", store, cfg)
    def pairs(budget: Long) =
      Dedup.incrementalFromStore(delta, store, "doc_id", "text", cfg,
        broadcastTouchedBytes = budget)
    // 1-byte budget forces the shuffle left_semi fallback; results identical
    val gated = pairs(1L).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val broad = pairs(1L << 30).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gated === broad, "gated fallback must emit the same pairs")
    assert(gated.contains((50L, 51L)))
    // With size-estimated broadcasts disabled, the only broadcasts left are
    // explicit hints: the in-budget plan still has one (the touched-keys
    // semi join), the gated plan has none — i.e. over budget we genuinely
    // stop FORCING a driver-sized broadcast and let the join exchange.
    // (dropOversizedBuckets keeps its own explicit LeftAnti broadcast —
    // only the touched-keys LeftSemi join is under this gate)
    def semiLines(budget: Long): Seq[String] =
      pairs(budget).queryExecution.sparkPlan.toString
        .linesIterator.filter(_.contains("LeftSemi")).toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(semiLines(1L << 30).exists(_.contains("BroadcastHashJoin")))
      val gatedSemis = semiLines(1L)
      assert(gatedSemis.nonEmpty && gatedSemis.forall(!_.contains("BroadcastHashJoin")),
        s"over-budget plan must not force a broadcast of the touched keys:\n${gatedSemis.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dropNearDups keeps the smaller id of each pair") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text", Dedup.MinHashConfig(threshold = 0.5))
    val kept = Dedup.dropNearDups(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(10L, 20L, 30L, 40L))
  }

  test("simHashPairs finds near-dups within hamming budget") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 8).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((20L, 21L))) // identical -> hamming 0
    val h = pairs.find(r => r.getLong(0) == 20L).get.getAs[Int]("hamming")
    assert(h == 0)
  }

  test("ngramJaccardPairs inverted-index join finds overlapping docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((10L, 11L)))
    assert(pairSet.contains((20L, 21L)))
    assert(pairSet.size == 2)
  }

  test("ngramJaccardPairs stop-gram small path matches the large path at the same cap") {
    // The r22 small-corpus short-circuit fires only when NO gram exceeds
    // the df cap, so the pre-existing general branch (fullyIndexed split +
    // fallback full-array verify) needs a corpus that trips the cap:
    // 20/21/22 are triplicates (every gram df 3 > cap 2 -> all stopped, no
    // candidates), and 60/61 are near-dups whose shared lead gram also
    // appears in 62 (df 3 -> stopped), leaving them PARTIALLY indexed so
    // their candidate pair goes through the fallback verify. The general
    // small branch and the PPJoin large branch must agree exactly.
    val stopDocs = docs.unionByName(Seq(
      (22L, "spark shuffles data between executors during wide transformations always"),
      (60L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (61L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (62L, "alpha beta gamma completely different ending words forever and ever")
    ).toDF("doc_id", "text"))
    def run(minDocs: Int) =
      Dedup.ngramJaccardPairs(stopDocs, "doc_id", "text", n = 3, threshold = 0.5,
        indexDocFreq = 2, prefixMinDocs = minDocs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val small = run(10000)
    assert(small == run(0))
    // the fallback-verified near-dup pair survives; the stop-only
    // triplicates cannot form candidates under the cap
    assert(small.exists { case (a, b, _) => (a, b) == (60L, 61L) }, s"got $small")
    assert(!small.exists { case (a, b, _) => Set(a, b).subsetOf(Set(20L, 21L, 22L)) })
  }

  test("ngramJaccardPairs prefix path finds the same pairs as the naive index") {
    // default prefixMinDocs keeps this 6-doc corpus on the naive path;
    // prefixMinDocs = 0 forces the PPJoin prefix path — pair sets and
    // Jaccard values must agree exactly
    def run(minDocs: Int) =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
        prefixMinDocs = minDocs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(0) == run(10000))
  }

  test("ngram large-path verify runs as BroadcastHashJoins, not pair-keyed array sorts") {
    // the r5 10x regression shape: SortMergeJoins exchanging+sorting the
    // multi-KB shingle arrays per candidate pair. The verify must attach
    // arrays via broadcast joins when the candidate-touched set fits.
    val plan = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5, prefixMinDocs = 0).queryExecution.executedPlan.toString
    assert(plan.contains("jaccard_long"), plan.take(1500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    // no sort anywhere downstream of an array-carrying join: the only
    // SortMergeJoin-eligible joins in this path are the narrow candidate
    // self-join, which never carries `hashes`
    val sortingArrays = plan.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("h_a"))
    assert(!sortingArrays, "array verify went through a SortMergeJoin")
  }

  test("ngram large-path oversized verify sets degrade to the shuffle shape") {
    // a 1-byte budget can never fit the arrays: the fallback join must
    // produce identical pairs/scores
    val broadcastPath = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5, prefixMinDocs = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val shufflePath = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5, prefixMinDocs = 0, broadcastVerifyBytes = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(broadcastPath == shufflePath && broadcastPath.nonEmpty)
  }

  test("embeddingNearDupPairs finds planted near-identical vectors") {
    val base = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val nearly = base.clone(); nearly(0) = base(0) + 0.001f
    val other = Array.tabulate(8)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((1L, base.toSeq), (2L, nearly.toSeq), (3L, other.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", dim = 8,
      threshold = 0.99, sigBits = 8, bandBits = 4).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((1L, 2L)), s"got $pairSet")
    assert(!pairSet.contains((1L, 3L)))
  }

  test("c4SpanDedup removes repeated three-sentence spans corpus-wide, keeps first") {
    val span = "First shared sentence here. Second shared sentence here. Third shared sentence here."
    val docA = s"Unique opening for doc a. $span Unique closing for doc a."
    val docB = s"Totally different start b! $span"   // span repeats -> removed
    val docC = "No duplicated content in this one. Just two sentences."
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val out = Dedup.c4SpanDedup(df, "doc_id", "text")
      .orderBy("doc").collect()

    val a = out(0)
    assert(a.getAs[Int]("n_removed") == 0) // first occurrence keeps its span
    assert(a.getAs[String]("clean_text") == docA)

    val b = out(1)
    assert(b.getAs[Int]("n_removed") == 3) // the three shared sentences go
    assert(b.getAs[String]("clean_text") == "Totally different start b!")

    val c = out(2)
    assert(c.getAs[Int]("n_removed") == 0 && c.getAs[Int]("n_sentences") == 2)
    assert(c.getAs[String]("clean_text") == docC)

    // a doc that is ONLY a duplicated span still comes back, emptied
    val df2 = Seq((1L, span), (2L, span)).toDF("doc_id", "text")
    val out2 = Dedup.c4SpanDedup(df2, "doc_id", "text").orderBy("doc").collect()
    assert(out2(0).getAs[String]("clean_text") == span)
    assert(out2(1).getAs[String]("clean_text") == "")
    assert(out2.length == 2)
  }

  test("substringDedup removes planted long duplicated runs, keeps first occurrence") {
    val rnd = new scala.util.Random(7)
    def words(n: Int, tag: String) = (0 until n).map(_ => s"$tag${rnd.nextInt(5000)}").mkString(" ")
    val dup = words(60, "shared") // 60-token duplicated run (minLen = 50)
    val docA = s"${words(30, "a")} $dup ${words(25, "a")}"
    val docB = s"${words(40, "b")} $dup" // later doc: loses the run
    val docC = words(80, "c") // no duplication
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", minLen = 50, k = 10)
      .orderBy("doc").collect()

    val a = out(0)
    assert(a.getAs[Int]("n_removed_tokens") == 0) // winner keeps the run
    assert(a.getAs[Int]("n_tokens") == 115)
    val b = out(1)
    assert(b.getAs[Int]("n_removed_tokens") == 60)
    assert(b.getAs[String]("clean_text") == docB.toLowerCase.split("\\W+")
      .filter(_.nonEmpty).take(40).mkString(" "))
    val c = out(2)
    assert(c.getAs[Int]("n_removed_tokens") == 0)
    assert(c.getAs[Int]("n_kept_tokens") == 80)

    // runs shorter than minLen survive
    val short = words(20, "s")
    val df2 = Seq((1L, s"${words(40, "x")} $short"), (2L, s"${words(40, "y")} $short"))
      .toDF("doc_id", "text")
    val out2 = Dedup.substringDedup(df2, "doc_id", "text", minLen = 50, k = 10)
      .orderBy("doc").collect()
    assert(out2.forall(_.getAs[Int]("n_removed_tokens") == 0))

    // same-doc periodic repetition: the later occurrence goes, one copy stays
    val df3 = Seq((1L, s"$dup $dup ${words(10, "z")}")).toDF("doc_id", "text")
    val out3 = Dedup.substringDedup(df3, "doc_id", "text", minLen = 50, k = 10).collect()
    assert(out3(0).getAs[Int]("n_removed_tokens") == 60)
    assert(out3(0).getAs[Int]("n_kept_tokens") == 70)
  }

  test("connectedComponents resolves transitive groups; dropByComponents keeps min per group") {
    import spark.implicits._
    // a 3-chain, a 2-pair, and a 4-chain (diameter exercises iteration)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 10L), (10L, 11L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      8L -> 8L, 9L -> 8L, 10L -> 8L, 11L -> 8L))
    val docs = (1L to 12L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val kept = Dedup.dropByComponents(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exactly one survivor (the min id) per component; singletons untouched
    assert(kept == Set(1L, 4L, 5L, 7L, 8L, 12L))
    graft.GraftCaches.releaseAll(spark)
  }

  test("TextHashing primitives are deterministic and sane") {
    val s1 = TextHashing.minHashSignature(TextHashing.shingleHashes("a b c d e f", 3), 64)
    val s2 = TextHashing.minHashSignature(TextHashing.shingleHashes("a b c d e f", 3), 64)
    assert(s1.toSeq == s2.toSeq)
    assert(TextHashing.jaccard(Array(1L, 2L, 3L), Array(2L, 3L, 4L)) == 0.5)
    assert(TextHashing.simHash64("x y z") == TextHashing.simHash64("x y z"))
    assert(TextHashing.ngrams("a b c d", 3).toSeq == Seq("a b c", "b c d"))
  }
}
