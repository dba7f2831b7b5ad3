package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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
    "rolling_hash" -> (args => RollingHashExpr(args.head)))

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
