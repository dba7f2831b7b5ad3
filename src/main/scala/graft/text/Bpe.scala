package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016): the token
  * accounting behind every LLM training budget. Two halves, both
  * Spark-first:
  *
  * TRAIN — BPE training never iterates the corpus: it iterates the
  * WORD-FREQUENCY DICTIONARY (how HF tokenizers/sentencepiece train too).
  * So the distributed part is one `groupBy(word).count` — the 100 TB
  * corpus shuffles only (word, count) pairs — and the merge loop runs
  * locally on the collected dictionary, bounded by `maxVocab` most
  * frequent words (deterministic count-desc/word-asc tie-break).
  *
  * ENCODE — a native codegen'd expression ([[BpeEncodeExpr]]): the merge
  * table rides the plan as a `addReferenceObj` constant (same pattern as
  * `nearest_centroids`' trained centroids), each word is encoded by
  * applying the merges IN ORDER, one canonical left-to-right
  * non-overlapping pass per merge, with a per-executor memo cache —
  * natural-language word frequency follows Zipf, so the cache hit rate
  * approaches 1 and the per-row cost collapses to a hash lookup. No UDF,
  * no encoder round-trip; the scan stays in WholeStageCodegen.
  *
  * Tokens are characters merged within whitespace words (no end-of-word
  * marker; the caller normalizes case if wanted). Applying a merge list
  * in order is the reference apply algorithm; for ranks produced by
  * [[train]] it coincides with rank-greedy encoding.
  */
object Bpe {

  /** Learn `numMerges` merges from the corpus. Returns merges as
    * "left right" strings, in application order.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 100000): Seq[String] = {
    val dict: Array[(String, Long)] = df
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w"))
      .limit(maxVocab) // bounded driver-side dictionary, NOT the corpus
      .collect().map(r => (r.getString(0), r.getLong(1)))

    learnMerges(dict.map { case (w, c) => (w.map(_.toString).toArray, c) },
      numMerges)
  }

  /** text column -> array<string> of BPE tokens under the given merges. */
  def encode(text: Column, merges: Seq[String]): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(text), merges))

  /** BYTE-LEVEL encode (the GPT-2 shape; Radford et al. 2019, public
    * encoder spec): text column -> array<string> of byte-level BPE tokens.
    * Pre-tokenization uses GPT-2's published regex (contractions, letter
    * runs, number runs, punctuation runs — each optionally carrying its
    * leading space); each pre-token's UTF-8 bytes map through the
    * bytes→unicode table (256-symbol base alphabet; space becomes 'Ġ'),
    * then merges apply RANK-GREEDILY (lowest-rank adjacent pair first),
    * exactly the published bpe() loop. This is what real token budgets
    * are counted in: whitespace is part of the token ("Ġworld"), unknown
    * characters can't fall out of vocabulary (every byte has a base
    * symbol), and no end-of-word marker is needed.
    *
    * Same execution shape as [[encode]]: a native codegen'd expression,
    * merge table as a plan constant, per-executor Zipf memo cache keyed
    * by pre-token.
    */
  def encodeBytes(text: Column, merges: Seq[String]): Column =
    ColumnBridge.column(BpeByteEncodeExpr(ColumnBridge.expression(text), merges))

  /** Inverse of [[encodeBytes]]: byte-level BPE is LOSSLESS (every byte
    * has a base symbol; merges only concatenate), so decoding is
    * concatenate tokens → map each stand-in char back to its byte →
    * UTF-8 decode. `decodeBytes(encodeBytes(t, m)) === t` for every
    * merge table and every input (round-trip spec'd and on the hash
    * path via q_bpe_roundtrip).
    */
  def decodeBytes(tokens: Column): Column =
    ColumnBridge.column(BpeByteDecodeExpr(ColumnBridge.expression(tokens)))

  /** Learn `numMerges` BYTE-LEVEL merges. Distributed part: GPT-2
    * regex pre-tokenization + one `groupBy(pretoken).count` — the corpus
    * shuffles only (pre-token, count) pairs; the merge loop runs locally
    * on the byte-mapped dictionary bounded by `maxVocab`, sharing
    * [[learnMerges]] with the char-level trainer. Returned merges are in
    * application order over byte-alphabet symbols ("Ġ t", "Ġt h", ...).
    */
  def trainBytes(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 100000): Seq[String] = {
    val dict: Array[(String, Long)] = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(BpeByteTable.Gpt2Pattern), lit(0))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    learnMerges(dict.map { case (w, c) =>
      (BpeByteTable.toByteSymbols(w), c) }, numMerges)
  }

  /** The shared dictionary merge loop (Sennrich et al. 2016 train):
    * deterministic count-desc / lexicographic tie-break per step.
    */
  private[text] def learnMerges(dictVocab: Array[(Array[String], Long)],
      numMerges: Int): Seq[String] = {
    var vocab = dictVocab
    val merges = mutable.ArrayBuffer[String]()
    var i = 0
    while (i < numMerges) {
      val pairCounts = mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (parts, c) =>
        var j = 0
        while (j < parts.length - 1) {
          val k = (parts(j), parts(j + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) { i = numMerges }
      else {
        val ((a, b), _) = pairCounts.minBy { case ((x, y), c) => (-c, x, y) }
        merges += s"$a $b"
        vocab = vocab.map { case (parts, c) => (BpeTable.mergeOnce(parts, a, b), c) }
        i += 1
      }
    }
    merges.toSeq
  }
}

/** The plan-constant merge table + per-executor word memo cache. */
final class BpeTable(mergeList: Seq[String]) extends Serializable {
  private val merges: Array[(String, String)] = mergeList.map { m =>
    val sp = m.indexOf(' ')
    require(sp > 0 && sp < m.length - 1, s"bad merge '$m': want 'left right'")
    (m.substring(0, sp), m.substring(sp + 1))
  }.toArray

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  def encodeWord(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var parts = w.map(_.toString).toArray
    var i = 0
    while (i < merges.length) {
      parts = BpeTable.mergeOnce(parts, merges(i)._1, merges(i)._2)
      i += 1
    }
    if (cache.size < 100000) cache.put(w, parts) // Zipf head; bounded
    parts
  }
}

object BpeTable {
  /** One canonical pass: merge every non-overlapping (a,b) left to right. */
  def mergeOnce(parts: Array[String], a: String, b: String): Array[String] = {
    val out = mutable.ArrayBuffer[String]()
    var i = 0
    while (i < parts.length) {
      if (i + 1 < parts.length && parts(i) == a && parts(i + 1) == b) {
        out += a + b; i += 2
      } else { out += parts(i); i += 1 }
    }
    out.toArray
  }
}

/** Byte-level BPE machinery (GPT-2 shape): plan-constant merge RANKS +
  * per-executor pre-token memo cache. Unlike [[BpeTable]]'s in-order
  * application, apply here is RANK-GREEDY — the published gpt-2 bpe()
  * loop: repeatedly merge the lowest-rank adjacent pair until none of
  * the remaining pairs has a rank. (For a merge table produced by
  * training the two strategies coincide — each merge's operands are only
  * producible by earlier merges, so no earlier pair can reappear after a
  * later merge — which is what lets the DuckDB oracle replay the chain
  * in order; `BpeByteSpec` asserts the agreement over the corpus.)
  */
final class BpeByteTable(mergeList: Seq[String]) extends Serializable {
  private val ranks = {
    val m = new java.util.HashMap[String, Integer]()
    mergeList.zipWithIndex.foreach { case (s, i) =>
      val sp = s.indexOf(' ')
      require(sp > 0 && sp < s.length - 1, s"bad merge '$s': want 'left right'")
      m.put(s, i)
    }
    m
  }
  private def rankOf(a: String, b: String): Int = {
    val r = ranks.get(a + " " + b)
    if (r == null) Int.MaxValue else r.intValue()
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** One pre-token (regex match, raw text) -> byte-level BPE tokens. */
  def encodePreToken(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var parts = BpeByteTable.toByteSymbols(w)
    // gpt-2 bpe(): find the lowest-rank adjacent pair, merge ALL its
    // occurrences left-to-right, repeat until no pair has a rank
    var done = parts.length < 2
    while (!done) {
      var best = Int.MaxValue; var bi = -1
      var i = 0
      while (i < parts.length - 1) {
        val r = rankOf(parts(i), parts(i + 1))
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0 || best == Int.MaxValue) done = true
      else {
        parts = BpeTable.mergeOnce(parts, parts(bi), parts(bi + 1))
        if (parts.length < 2) done = true
      }
    }
    if (cache.size < 100000) cache.put(w, parts) // Zipf head; bounded
    parts
  }
}

object BpeByteTable {
  /** GPT-2's published pre-tokenization regex: contractions, letter runs,
    * number runs, other-symbol runs (each with an optional leading
    * space), then whitespace.
    */
  val Gpt2Pattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  @transient private lazy val compiled = java.util.regex.Pattern.compile(Gpt2Pattern)

  /** The GPT-2 bytes→unicode table: the 188 printable/latin bytes map to
    * their own codepoints; the remaining 68 map to 256+n in table order —
    * every byte gets a PRINTABLE stand-in character (space -> 'Ġ' =
    * U+0120), so tokens are plain strings and the base alphabet is
    * exactly 256 symbols.
    */
  private val byteChar: Array[Char] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ'))
      .map(_.toInt).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Inverse of [[byteChar]]: stand-in char -> original byte. */
  private val charByte: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte]()
    var b = 0
    while (b < 256) { m.put(byteChar(b), b.toByte); b += 1 }
    m
  }

  /** Token string -> original bytes (decode side). */
  def fromByteSymbols(tokens: ArrayData): UTF8String = {
    val sb = new StringBuilder
    var i = 0
    while (i < tokens.numElements()) {
      sb.append(tokens.getUTF8String(i).toString); i += 1
    }
    val s = sb.toString
    val out = new Array[Byte](s.length)
    var j = 0
    while (j < s.length) {
      val b = charByte.get(s.charAt(j))
      require(b != null, f"not a byte-level BPE symbol char: U+${s.charAt(j).toInt}%04X")
      out(j) = b; j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Pre-token -> base symbols: UTF-8 bytes, each mapped through the
    * bytes→unicode table, one symbol per byte.
    */
  def toByteSymbols(w: String): Array[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = String.valueOf(byteChar(bytes(i) & 0xff))
      i += 1
    }
    out
  }

  /** Split text into GPT-2 pre-tokens (regex findall). */
  def preTokenize(text: String): Array[String] = {
    val m = compiled.matcher(text)
    val out = mutable.ArrayBuffer[String]()
    while (m.find()) out += m.group()
    out.toArray
  }
}

/** Static entry point for codegen (object methods surface as Java statics). */
object BpeHelpers {
  def decodeBytesTokens(tokens: ArrayData): UTF8String =
    BpeByteTable.fromByteSymbols(tokens)

  def encodeBytesText(text: UTF8String, table: BpeByteTable): ArrayData = {
    val pts = BpeByteTable.preTokenize(text.toString)
    val out = mutable.ArrayBuffer[UTF8String]()
    var i = 0
    while (i < pts.length) {
      val toks = table.encodePreToken(pts(i))
      var j = 0
      while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
  def encodeText(text: UTF8String, table: BpeTable): ArrayData = {
    val words = text.toString.trim.split("\\s+")
    val out = mutable.ArrayBuffer[UTF8String]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val toks = table.encodeWord(words(i))
        var j = 0
        while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

case class BpeEncodeExpr(child: Expression, merges: Seq[String])
  extends UnaryExpression {
  @transient private lazy val table = new BpeTable(merges)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  override protected def nullSafeEval(input: Any): Any =
    BpeHelpers.encodeText(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, "graft.text.BpeTable")
    defineCodeGen(ctx, ev, c => s"graft.text.BpeHelpers.encodeText($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

case class BpeByteDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode_bytes"
  override protected def nullSafeEval(input: Any): Any =
    BpeHelpers.decodeBytesTokens(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.BpeHelpers.decodeBytesTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeByteDecodeExpr =
    copy(child = newChild)
}

case class BpeByteEncodeExpr(child: Expression, merges: Seq[String])
  extends UnaryExpression {
  @transient private lazy val table = new BpeByteTable(merges)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_bytes"
  override protected def nullSafeEval(input: Any): Any =
    BpeHelpers.encodeBytesText(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeByteTable", table, "graft.text.BpeByteTable")
    defineCodeGen(ctx, ev, c => s"graft.text.BpeHelpers.encodeBytesText($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeByteEncodeExpr =
    copy(child = newChild)
}
