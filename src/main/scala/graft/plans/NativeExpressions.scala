package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.TextHashing

/** Static helpers the generated code calls (one virtual-free static call
  * per row — the reason these beat Scala UDFs: no encoder round-trip, no
  * closure dispatch, and they stay inside the WholeStageCodegen stage).
  */
object ExprHelpers {
  def simhash64(s: UTF8String): Long = TextHashing.simHash64(s.toString)

  def minhashBands(s: UTF8String, shingleSize: Int, numPerms: Int,
      numBands: Int, seed: Int): ArrayData = {
    val sig = TextHashing.minHashSignature(
      TextHashing.shingleHashes(s.toString, shingleSize), numPerms, seed)
    new GenericArrayData(TextHashing.bandHashes(sig, numBands, numPerms / numBands))
  }

  def shingleHashes(s: UTF8String, k: Int): ArrayData =
    new GenericArrayData(TextHashing.shingleHashes(s.toString, k))

  def rollingHash(s: UTF8String): Long = {
    // Rabin-Karp polynomial rolling hash over the raw bytes, base 257 mod 2^64.
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 257L + (bytes(i) & 0xff); i += 1 }
    h
  }

  def jaccardLong(a: ArrayData, b: ArrayData): Double =
    TextHashing.jaccard(a.toLongArray(), b.toLongArray())

  // Seeded gaussian hyperplanes, built once per (dim, bits, seed) per JVM —
  // the same scala.util.Random draw order as the UDF this replaced, so
  // signatures (and every recall spec / pair set) are bit-identical.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]
  private def planes(dim: Int, bits: Int, seed: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((dim, bits, seed), _ => {
      val rnd = new scala.util.Random(seed)
      Array.fill(bits, dim)(rnd.nextGaussian())
    })

  def planeSig(v: ArrayData, dim: Int, bits: Int, seed: Int): Int = {
    val p = planes(dim, bits, seed)
    val n = math.min(v.numElements(), dim)
    var sig = 0
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var i = 0
      val row = p(b)
      while (i < n) { dot += row(i) * v.getFloat(i); i += 1 }
      if (dot > 0) sig |= (1 << b)
      b += 1
    }
    sig
  }
}

/** 64-bit SimHash as a native Catalyst expression (SURVEY §2.6 scale path:
  * the signature computation is the per-row hot loop of simhash dedup over
  * 100 TB, so it runs inside codegen rather than as a UDF).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    ExprHelpers.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ExprHelpers.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** MinHash LSH band hashes as a native expression: text -> array<long> of
  * band bucket keys, one pass, codegen'd.
  */
case class MinHashBandsExpr(child: Expression, shingleSize: Int = 3,
    numPerms: Int = 64, numBands: Int = 16, seed: Int = 42)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"
  override protected def nullSafeEval(input: Any): Any =
    ExprHelpers.minhashBands(input.asInstanceOf[UTF8String], shingleSize, numPerms, numBands, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ExprHelpers.minhashBands($c, $shingleSize, $numPerms, $numBands, $seed)")
  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

/** Distinct word-k-shingle hashes as a native expression: text ->
  * array<long>. One pass per document, codegen'd; feeds minhash
  * verification (the shingle table is computed once and joined to
  * candidate pairs, so document text never enters the band shuffle).
  */
case class ShingleHashesExpr(child: Expression, shingleSize: Int = 3)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    ExprHelpers.shingleHashes(input.asInstanceOf[UTF8String], shingleSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ExprHelpers.shingleHashes($c, $shingleSize)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** Rabin-Karp rolling hash fingerprint (content-defined chunking / dedup
  * pre-pass primitive).
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override protected def nullSafeEval(input: Any): Any =
    ExprHelpers.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ExprHelpers.rollingHash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

/** Exact Jaccard over two long-hash set columns (array<long>, array<long>)
  * -> double. The per-candidate-pair verify step of minhash/ngram dedup —
  * codegen'd so the verify join stays inside WholeStageCodegen.
  */
case class JaccardLongExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprHelpers.jaccardLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.ExprHelpers.jaccardLong($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLongExpr =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: array<float> -> int sign-bit pattern
  * against `bits` seeded gaussian planes. The corpus-wide projection of
  * embedding near-dup / LSH top-k — native so the full-corpus scan stays
  * in codegen (the same reason simhash64/minhash_bands are native).
  */
case class PlaneSigExpr(child: Expression, dim: Int, bits: Int, seed: Int)
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "plane_sig"
  override protected def nullSafeEval(input: Any): Any =
    ExprHelpers.planeSig(input.asInstanceOf[ArrayData], dim, bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ExprHelpers.planeSig($c, $dim, $bits, $seed)")
  override protected def withNewChildInternal(newChild: Expression): PlaneSigExpr =
    copy(child = newChild)
}

object NativeExpressions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (args => SimHash64Expr(args.head)),
    "minhash_bands" -> { args =>
      def lit(i: Int): Int = args(i).eval().asInstanceOf[Number].intValue()
      args.length match {
        case 1 => MinHashBandsExpr(args.head)
        case 4 => MinHashBandsExpr(args.head, lit(1), lit(2), lit(3))
        case 5 => MinHashBandsExpr(args.head, lit(1), lit(2), lit(3), lit(4))
        case n => throw new IllegalArgumentException(s"minhash_bands: bad arg count $n")
      }
    },
    "shingle_hashes" -> { args =>
      args.length match {
        case 1 => ShingleHashesExpr(args.head)
        case 2 => ShingleHashesExpr(args.head,
          args(1).eval().asInstanceOf[Number].intValue())
        case n => throw new IllegalArgumentException(s"shingle_hashes: bad arg count $n")
      }
    },
    "rolling_hash" -> (args => RollingHashExpr(args.head)),
    "jaccard_long" -> (args => JaccardLongExpr(args(0), args(1))),
    "plane_sig" -> { args =>
      def lit(i: Int): Int = args(i).eval().asInstanceOf[Number].intValue()
      require(args.length == 4, s"plane_sig(vec, dim, bits, seed): bad arg count ${args.length}")
      PlaneSigExpr(args.head, lit(1), lit(2), lit(3))
    })

  /** Register the native functions in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** SparkSessionExtensions entry point: add
  * `spark.sql.extensions=graft.plans.GraftExtensions` and every session
  * gets the native functions without user code.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    NativeExpressions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.NativeExpressions", name), builder))
    }
}
