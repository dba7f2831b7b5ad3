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

    var vocab: Array[(Array[String], Long)] =
      dict.map { case (w, c) => (w.map(_.toString).toArray, c) }
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
        // deterministic: max count, then lexicographically first pair
        val ((a, b), _) = pairCounts.minBy { case ((x, y), c) => (-c, x, y) }
        merges += s"$a $b"
        vocab = vocab.map { case (parts, c) => (BpeTable.mergeOnce(parts, a, b), c) }
        i += 1
      }
    }
    merges.toSeq
  }

  /** text column -> array<string> of BPE tokens under the given merges. */
  def encode(text: Column, merges: Seq[String]): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(text), merges))
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

/** Static entry point for codegen (object methods surface as Java statics). */
object BpeHelpers {
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
