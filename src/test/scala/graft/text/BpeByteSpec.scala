package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Byte-level (GPT-2-shape) BPE: base alphabet, pre-tokenization,
  * rank-greedy apply, training, and the in-order-replay equivalence the
  * q_bpe_bytes oracle depends on.
  */
class BpeByteSpec extends SparkSpec {
  import spark.implicits._

  // a fixed small merge table sufficient to reach GPT-2's own tokens for
  // "Hello world" (the published encoder's bytes->unicode table maps
  // space to 'Ġ'; ids from the public gpt2 vocabulary)
  private val helloMerges = Seq(
    "H e", "l l", "He ll", "Hell o",
    "Ġ w", "o r", "l d", "or ld", "Ġw orld")

  test("known public vector: GPT-2 'Hello world' -> [Hello, Ġworld] -> ids [15496, 995]") {
    val toks = Seq("Hello world").toDF("text")
      .select(Bpe.encodeBytes(col("text"), helloMerges).as("t"))
      .as[Seq[String]].collect()(0)
    assert(toks === Seq("Hello", "Ġworld"))
    val gpt2Vocab = Map("Hello" -> 15496, "Ġworld" -> 995)
    assert(toks.map(gpt2Vocab) === Seq(15496, 995))
  }

  test("byte alphabet: every byte has a printable base symbol; space rides the token") {
    val toks = Seq("ab cd").toDF("text")
      .select(Bpe.encodeBytes(col("text"), Nil).as("t"))
      .as[Seq[String]].collect()(0)
    assert(toks === Seq("a", "b", "Ġ", "c", "d"))
    // a non-printable byte maps to a 256+n stand-in, never drops
    val nl = Seq("a\nb").toDF("text")
      .select(Bpe.encodeBytes(col("text"), Nil).as("t"))
      .as[Seq[String]].collect()(0)
    assert(nl.length === 3 && nl(0) === "a" && nl(2) === "b")
    assert(nl(1).length === 1 && nl(1).charAt(0) >= 256.toChar)
  }

  test("gpt-2 pre-tokenization: contractions split, punctuation runs keep their space") {
    val pts = BpeByteTable.preTokenize("it's up!! 42 ok")
    assert(pts.toSeq === Seq("it", "'s", " up", "!!", " 42", " ok"))
  }

  test("rank-greedy: lowest-rank pair merges first regardless of position") {
    // word "abc" with ranks: (b,c)=0, (a,b)=1 — greedy merges (b,c) first
    val toks = Seq("abc").toDF("text")
      .select(Bpe.encodeBytes(col("text"), Seq("b c", "a b")).as("t"))
      .as[Seq[String]].collect()(0)
    assert(toks === Seq("a", "bc"))
  }

  test("multi-byte characters decompose into their UTF-8 bytes") {
    val toks = Seq("é").toDF("text") // U+00E9 = 0xC3 0xA9 in UTF-8
      .select(Bpe.encodeBytes(col("text"), Nil).as("t"))
      .as[Seq[String]].collect()(0)
    assert(toks.length === 2, "two bytes, two base symbols")
  }

  test("trainBytes: deterministic merges over the pre-token dictionary") {
    val df = Seq(" aa aa aa").toDF("text")
    // pre-tokens: 'Ġaa' x3; pairs (Ġ,a)=3 and (a,a)=3 tie — lexicographic
    // 'a' (97) < 'Ġ' (288) picks (a,a); then (Ġ,aa)
    assert(Bpe.trainBytes(df, "text", numMerges = 2) ===
      Seq("a a", "Ġ aa"))
  }

  test("decode inverts encode for any merge table, any bytes (losslessness)") {
    val samples = Seq("Hello world", "it's up!! 42 ok", "a\nb\ttab  two",
      "héllo wörld é", "", "   ", "mixed 123 #!?")
    for (m <- Seq(Nil, helloMerges)) {
      val got = samples.toDF("text")
        .select(col("text"),
          Bpe.decodeBytes(Bpe.encodeBytes(col("text"), m)).as("r"))
        .as[(String, String)].collect()
      got.foreach { case (t, r) => assert(r === t, s"roundtrip broke on '$t'") }
    }
  }

  test("trained tables: rank-greedy apply == in-order replay (the oracle contract)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(concat(lit(" "), col("text")).as("text"))
    val merges = Bpe.trainBytes(docs, "text", numMerges = 24)
    val table = new BpeByteTable(merges)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).distinct().as[String].collect()
    words.foreach { w =>
      val pre = " " + w // raw pre-token; toByteSymbols maps 0x20 -> 'Ġ'
      val greedy = table.encodePreToken(pre).toSeq
      val inOrder = merges.foldLeft(BpeByteTable.toByteSymbols(pre)) { (parts, m) =>
        val Array(a, b) = m.split(" ")
        BpeTable.mergeOnce(parts, a, b)
      }.toSeq
      assert(greedy === inOrder, s"divergence on '$w'")
    }
  }
}
