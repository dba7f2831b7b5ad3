package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.6).
  *
  * Everything here is pure Column expressions over Spark builtins — no
  * UDFs, so the whole stage stays in codegen and scales as a narrow map.
  */
object TextAnalysis {

  /** Marker-word profiles for the n-gram-heuristic language ID. Tiny by
    * design (deterministic, auditable); swap for real profiles in prod.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "es" -> Seq("el", "la", "que", "es"),
    "fr" -> Seq("le", "la", "et", "est"))

  private def wordCount(tokens: Column, w: String): Column =
    size(filter(tokens, x => x === lit(w)))

  /** Language-ID heuristic: argmax of marker-word occurrence counts;
    * ties break toward the lexicographically larger language code, score 0
    * falls back to "und" (undetermined).
    */
  def langId(textCol: Column): Column = {
    val toks = split(lower(textCol), "\\W+")
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> words.map(w => wordCount(toks, w)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // ascending fold leaves the largest code outermost -> it wins ties.
    scores.foldLeft(lit("und")) { case (acc, (lang, score)) =>
      when(score === best && best > 0, lang).otherwise(acc)
    }
  }

  /** Quality-scoring features: char length, word count, punctuation ratio,
    * mean word length, distinct-word (repetition) ratio, stopword ratio.
    */
  def qualityFeatures(df: DataFrame, textCol: String,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")): DataFrame = {
    val t = col(textCol)
    val words = split(trim(lower(t)), "\\s+")
    val nWords = size(words)
    val nChars = length(t)
    val punct = nChars - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val stopHits = size(filter(words, w => w.isin(stopwords.map(s => lit(s)): _*)))
    df.withColumns(Map(
      "n_chars_q" -> nChars.cast("int"),
      "n_words" -> nWords.cast("int"),
      "punct_ratio" -> (punct.cast("double") / nChars),
      "mean_word_len" -> ((nChars - nWords + 1).cast("double") / nWords),
      "distinct_ratio" -> (size(array_distinct(words)).cast("double") / nWords),
      "stopword_ratio" -> (stopHits.cast("double") / nWords)))
  }

  /** Gopher-style corpus-quality rules (the published recipe from
    * "Scaling Language Models: Methods, Analysis & Insights from Training
    * Gopher", Rae et al. 2021, Appendix A — the de-facto standard corpus
    * filter), as pure Column expressions plus a combined pass flag:
    *  - word count within [minWords, maxWords]
    *  - mean word length within [3, 10]
    *  - symbol-to-word ratio (#, ellipsis) <= 0.1
    *  - fraction of words containing an alphabetic char >= 0.8
    *  - duplicate-line fraction <= 0.3 (repetition guard)
    * All narrow, shuffle-free; the word split happens once.
    */
  def gopherFlags(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = col(textCol)
    val words = split(trim(t), "\\s+")
    val nWords = size(words)
    val meanLen = (length(regexp_replace(t, "\\s+", "")).cast("double") / nWords)
    val symbols = size(regexp_extract_all(t, lit("#|\\.\\.\\.|…"), lit(0)))
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val lines = split(t, "\n")
    val dupLines = lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines)
    df.withColumns(Map(
        "g_n_words" -> nWords.cast("int"),
        "g_mean_word_len" -> meanLen,
        "g_symbol_ratio" -> (symbols.cast("double") / nWords),
        "g_alpha_word_ratio" -> (alphaWords.cast("double") / nWords),
        "g_dupline_ratio" -> dupLines))
      .withColumn("gopher_pass",
        col("g_n_words").between(minWords, maxWords) &&
        col("g_mean_word_len").between(3.0, 10.0) &&
        col("g_symbol_ratio") <= 0.1 &&
        col("g_alpha_word_ratio") >= 0.8 &&
        col("g_dupline_ratio") <= 0.3)
  }

  /** C4-style page cleaning (the published recipe from "Exploring the
    * Limits of Transfer Learning with a Unified Text-to-Text Transformer",
    * Raffel et al. 2020, §2.2 — the other de-facto standard corpus
    * filter next to [[gopherFlags]]), as pure Column expressions:
    *  - a line is RETAINED iff it ends in terminal punctuation (. ! ? or a
    *    closing quote), has at least `minLineWords` (5) words, and does not
    *    contain the word "javascript";
    *  - the page is KEPT iff its retained lines span at least
    *    `minSentences` (3) sentences (terminal-punctuation count), and the
    *    page contains neither "lorem ipsum" nor a curly brace.
    * (The original's dirty-word list and three-sentence-span dedup are the
    * dedup family's job; see Dedup / Decontamination.)
    * Emits the per-page features, the cleaned text (retained lines
    * re-joined), and the combined `c4_keep` flag. Narrow, shuffle-free,
    * one line split per page.
    */
  def c4Flags(df: DataFrame, textCol: String,
      minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val keptLines = filter(lines, l =>
      l.rlike("[.!?\"']\\s*$") &&
      size(split(trim(l), "\\s+")) >= minLineWords &&
      !lower(l).rlike("\\bjavascript\\b"))
    val keptText = array_join(keptLines, "\n")
    val nSentences = size(regexp_extract_all(keptText, lit("[.!?]"), lit(0)))
    val hasLorem = lower(t).contains("lorem ipsum")
    val hasBrace = t.contains("{")
    df.withColumns(Map(
        "c4_n_lines" -> size(lines).cast("int"),
        "c4_n_kept_lines" -> size(keptLines).cast("int"),
        "c4_n_sentences" -> nSentences.cast("int"),
        "c4_has_lorem" -> hasLorem,
        "c4_has_brace" -> hasBrace,
        "c4_clean_text" -> keptText))
      .withColumn("c4_keep",
        col("c4_n_sentences") >= minSentences &&
        !col("c4_has_lorem") && !col("c4_has_brace"))
  }

  /** Token counting: whitespace tokens and BPE-ish regex tokens
    * (letter runs / digit runs / single punctuation marks).
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumns(Map(
      "ws_tokens" -> size(split(trim(t), "\\s+")).cast("int"),
      "bpe_tokens" -> regexp_count(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("int")))
  }

  /** Content fingerprint: md5 of the whitespace/case-normalized text,
    * truncated to 16 hex chars. Cross-engine reproducible (DuckDB md5
    * agrees), constant-width, partition-key friendly.
    */
  def fingerprint(textCol: Column): Column =
    substring(md5(regexp_replace(lower(trim(textCol)), "\\s+", " ")), 1, 16)
}
