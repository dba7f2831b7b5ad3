package graft.text

import graft.{SparkSpec, Tables}

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val w = (1 to 30).map(i => s"w$i").mkString(" ") // 30 shared tokens

  test("contaminatedIds finds docs sharing a 13-gram with the benchmark") {
    val corpus = Seq(
      (1L, s"unique alpha beta $w gamma"),           // contains benchmark run
      (2L, "totally different text with no overlap at all whatsoever in any way"),
      (3L, w)).toDF("doc_id", "text")                 // is exactly the run
    val bench = Seq(s"prefix tokens $w suffix tokens").toDF("question")
    val ids = Decontamination.contaminatedIds(corpus, bench,
      "doc_id", "text", "question").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 3L))
    val clean = Decontamination.decontaminate(corpus, bench, "doc_id", "text", "question")
      .select("doc_id").as[Long].collect()
    assert(clean.toSeq == Seq(2L))
  }

  test("minMatches raises the overlap bar") {
    val corpus = Seq((1L, w)).toDF("doc_id", "text")
    val bench = Seq(w).toDF("q")
    // 30 tokens -> 18 distinct 13-grams shared
    assert(Decontamination.contaminatedIds(corpus, bench, "doc_id", "text", "q",
      minMatches = 18).count() == 1)
    assert(Decontamination.contaminatedIds(corpus, bench, "doc_id", "text", "q",
      minMatches = 19).count() == 0)
  }

  test("decontamination is a broadcast join over hashed grams") {
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bench = corpus.limit(5).select($"text".as("question"))
    val plan = Decontamination.decontaminate(corpus, bench, "doc_id", "text", "question")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    // the 5 seed docs must be dropped
    val n = corpus.count()
    val clean = Decontamination.decontaminate(corpus, bench, "doc_id", "text", "question").count()
    assert(clean <= n - 5)
  }

  test("bloom decontamination flags a superset of the exact pass (planted overlap)") {
    val w = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((1L, w), (2L, "completely different other words here entirely"),
      (3L, w + " trailing extra")).toDF("doc_id", "text")
    val bench = Seq(w).toDF("question")
    val exact = Decontamination.contaminatedIds(corpus, bench, "doc_id", "text", "question")
      .collect().map(_.getLong(0)).toSet
    val bloom = Decontamination.contaminatedIdsBloom(corpus, bench, "doc_id", "text",
      "question", expectedGrams = 1000L).collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(bloom)) // contamination never escapes
    assert(exact == Set(1L, 3L))
    assert(bloom == Set(1L, 3L)) // at this fpp and size, no false positives
    val clean = Decontamination.decontaminateBloom(corpus, bench, "doc_id", "text",
      "question", expectedGrams = 1000L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L))
  }

  test("bloom filter rides the plan as a scalar subquery, not literal bytes") {
    val w = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((1L, w)).toDF("doc_id", "text")
    val bench = Seq(w).toDF("question")
    // a production-sized filter: ~10M items at 1e-9 would be ~60 MB of
    // literal if embedded — the plan text must stay KB-sized
    val capsBefore = Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      .map(k => k -> spark.conf.getOption(k))
    val flagged = Decontamination.contaminatedIdsBloom(corpus, bench,
      "doc_id", "text", "question", expectedGrams = 10000000L, fpp = 1e-9)
    // the session-global runtime bloom caps are NOT mutated (ADVICE r6 —
    // the old raise leaked into Spark's own runtime filters)
    capsBefore.foreach { case (k, v) =>
      assert(spark.conf.getOption(k) == v, s"$k was mutated by the bloom build")
    }
    val plan = flagged.queryExecution.analyzed.toString
    assert(plan.contains("scalar-subquery"), plan.take(2000))
    assert(plan.length < 100000, s"plan blew up to ${plan.length} chars")
    // graft_bloom_agg sizes from literals: the plan carries the
    // un-clamped requested sizes (attr names carry exprIds, so regex)
    assert("graft_bloom_agg\\(gram#\\d+L, 10000000, ".r.findFirstIn(plan).isDefined,
      plan.take(2000))
    // the working temp view is dropped after the (eager) analysis
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_bloom_")), "temp view leaked")
    assert(flagged.collect().map(_.getLong(0)).toSet == Set(1L)) // still correct
  }

  test("bloom minMatches threshold damps per-document false-positive accumulation") {
    val w = (1 to 40).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((1L, w), (2L, "different words entirely unrelated to anything")).toDF("doc_id", "text")
    val bench = Seq(w).toDF("question")
    // doc 1 shares dozens of grams -> stays flagged at minMatches=5;
    // an FP-only doc would need 5 independent hits (p^5)
    val flagged = Decontamination.contaminatedIdsBloom(corpus, bench,
      "doc_id", "text", "question", expectedGrams = 1000L, minMatches = 5)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L))
  }

  test("redactPii replaces the documented classes and keeps other text") {
    val df = Seq(
      ("contact john.doe+x@example.org or call 555-123-4567 now",
        1),
      ("ssn 123-45-6789 card 4111 1111 1111 1111 ip 10.0.0.1 iban DE89370400440532013000", 2),
      ("nothing sensitive here", 3)).toDF("text", "id")
    val out = Decontamination.redactPii(df, "text", "red")
      .orderBy("id").select("red").as[String].collect()
    assert(out(0).contains("<EMAIL>") && out(0).contains("<PHONE>") && out(0).contains("contact"))
    assert(out(1).contains("<SSN>") && out(1).contains("<CARD>") &&
      out(1).contains("<IP>") && out(1).contains("<IBAN>"))
    assert(out(2) == "nothing sensitive here")
    val stats = Decontamination.piiStats(df, "text").collect()(0)
    assert(stats.getAs[Long]("<EMAIL>") == 1L && stats.getAs[Long]("<SSN>") == 1L)
  }

  test("overlapFractions grades contamination; fuzzy drop spares idiom overlap") {
    val bench = Seq("alpha beta gamma delta").toDF("question")
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),          // full copy: overlap 1.0
      (2L, "alpha beta gamma delta plus more however"), // partial copy
      (3L, "unrelated gamma delta text here"), // shares a sub-gram only
      (4L, "nothing shared at all today"))
      .toDF("doc_id", "text")
    val fr = Decontamination.overlapFractions(corpus, bench,
        "doc_id", "text", "question", ngram = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("overlap")).toMap
    assert(fr(1L) === 1.0)
    assert(fr(2L) > 0.0 && fr(2L) < 1.0)
    assert(fr(4L) === 0.0)
    val kept = Decontamination.decontaminateFuzzy(corpus, bench,
        "doc_id", "text", "question", ngram = 3, maxOverlap = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L)) // the copy dies
    assert(kept.contains(4L) && kept.contains(3L)) // incidental overlap lives
  }
}
