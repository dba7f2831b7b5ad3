package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the zeta scalar names Spark lacks
  * (VERDICT r7 polish item: the Scala-UDF registrations pay an encoder
  * round-trip per row AND break whole-stage codegen wherever they appear
  * in a projection — on a 100 TB scan that is the difference between one
  * generated loop and a per-row closure call).
  *
  * Each expression delegates to the SAME scalar logic in [[ZetaFunctions]]
  * through [[ZetaNativeHelpers]] (internal-type adapters), so semantics —
  * including the java.sql.Timestamp/default-zone temporal behavior the
  * DuckDB oracles pin down — are identical by construction; only the
  * execution path changes (inside codegen, no encoder crossing).
  * Timestamps convert via the same DateTimeUtils instant conversions the
  * ScalaUDF input/output converters used.
  *
  * Kept as UDFs deliberately: INSERT (asymmetric null semantics — null s1
  * returns s2), DES encrypt/decrypt (per-row cipher setup dominates either
  * way), CURRENT_TIME (0-ary, driver-constant).
  */
object ZetaNativeHelpers {
  private def toTs(micros: Long) = DateTimeUtils.toJavaTimestamp(micros)
  private def s(u: UTF8String) = u.toString

  def hextoraw(x: UTF8String): UTF8String =
    UTF8String.fromString(ZetaFunctions.hextoraw(s(x)))
  def rawtohex(x: UTF8String): UTF8String =
    UTF8String.fromString(ZetaFunctions.rawtohex(s(x)))
  def truncate(x: Double, d: Int): Double = ZetaFunctions.truncate(x, d)
  def zetaMod(a: Double, b: Double): Double = ZetaFunctions.zetaMod(a, b)
  def toCharNum(x: Double): UTF8String =
    UTF8String.fromString(ZetaFunctions.toCharNum(x))
  def dayname(micros: Long): UTF8String =
    UTF8String.fromString(ZetaFunctions.dayname(toTs(micros)))
  def monthname(micros: Long): UTF8String =
    UTF8String.fromString(ZetaFunctions.monthname(toTs(micros)))
  def formatdatetime(micros: Long, fmt: UTF8String): UTF8String =
    UTF8String.fromString(ZetaFunctions.formatdatetime(toTs(micros), s(fmt)))
  def parsedatetime(str: UTF8String, fmt: UTF8String): Long =
    DateTimeUtils.fromJavaTimestamp(ZetaFunctions.parsedatetime(s(str), s(fmt)))
  def isDate(str: UTF8String, fmt: UTF8String): Boolean =
    ZetaFunctions.isDate(s(str), s(fmt))
  def week(micros: Long): Int = ZetaFunctions.week(toTs(micros))
  def zetaWeek(micros: Long): Int = ZetaFunctions.zetaWeek(toTs(micros))
  def zetaDayOfWeek(micros: Long): Int = ZetaFunctions.zetaDayOfWeek(toTs(micros))
  def dayOfMonth(micros: Long): Int = toTs(micros).toLocalDateTime.getDayOfMonth
  def dayOfYear(micros: Long): Int = toTs(micros).toLocalDateTime.getDayOfYear
  def dayOfWeekH2(micros: Long): Int =
    toTs(micros).toLocalDateTime.getDayOfWeek.getValue % 7 + 1
  def dateadd(micros: Long, n: Long, unit: UTF8String): Long =
    DateTimeUtils.fromJavaTimestamp(ZetaFunctions.dateadd(toTs(micros), n, s(unit)))
  def zetaDatediff(a: Long, b: Long, unit: UTF8String): Long =
    ZetaFunctions.zetaDatediff(toTs(a), toTs(b), s(unit))
}

/** string -> string zeta leaf. */
case class ZetaStr1(child: Expression, name: String)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = name
  override protected def nullSafeEval(v: Any): Any = name match {
    case "hextoraw" => ZetaNativeHelpers.hextoraw(v.asInstanceOf[UTF8String])
    case _ => ZetaNativeHelpers.rawtohex(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZetaNativeHelpers.$name($c)")
  override protected def withNewChildInternal(c: Expression): ZetaStr1 = copy(child = c)
}

/** timestamp -> string zeta leaf (dayname / monthname). */
case class ZetaTsToStr(child: Expression, name: String)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = name
  override protected def nullSafeEval(v: Any): Any = name match {
    case "dayname" => ZetaNativeHelpers.dayname(v.asInstanceOf[Long])
    case _ => ZetaNativeHelpers.monthname(v.asInstanceOf[Long])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZetaNativeHelpers.$name($c)")
  override protected def withNewChildInternal(c: Expression): ZetaTsToStr = copy(child = c)
}

/** timestamp -> int zeta leaf (week / day-of-* family). */
case class ZetaTsToInt(child: Expression, name: String, helper: String)
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = name
  override protected def nullSafeEval(v: Any): Any = helper match {
    case "week" => ZetaNativeHelpers.week(v.asInstanceOf[Long])
    case "zetaWeek" => ZetaNativeHelpers.zetaWeek(v.asInstanceOf[Long])
    case "zetaDayOfWeek" => ZetaNativeHelpers.zetaDayOfWeek(v.asInstanceOf[Long])
    case "dayOfMonth" => ZetaNativeHelpers.dayOfMonth(v.asInstanceOf[Long])
    case "dayOfYear" => ZetaNativeHelpers.dayOfYear(v.asInstanceOf[Long])
    case _ => ZetaNativeHelpers.dayOfWeekH2(v.asInstanceOf[Long])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZetaNativeHelpers.$helper($c)")
  override protected def withNewChildInternal(c: Expression): ZetaTsToInt = copy(child = c)
}

/** TRUNCATE(x, digits) — toward-zero decimal truncation. */
case class ZetaTruncate(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "truncate"
  override protected def nullSafeEval(x: Any, d: Any): Any =
    ZetaNativeHelpers.truncate(x.asInstanceOf[Double], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, d) => s"graft.functions.ZetaNativeHelpers.truncate($x, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZetaTruncate =
    copy(left = l, right = r)
}

/** ZETA_MOD(a, b) — exact BigDecimal remainder (reference MOD semantics). */
case class ZetaModExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "zeta_mod"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZetaNativeHelpers.zetaMod(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZetaNativeHelpers.zetaMod($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZetaModExpr =
    copy(left = l, right = r)
}

/** TO_CHAR(number) — reference numeric rendering. */
case class ZetaToCharNum(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "to_char_num"
  override protected def nullSafeEval(v: Any): Any =
    ZetaNativeHelpers.toCharNum(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZetaNativeHelpers.toCharNum($c)")
  override protected def withNewChildInternal(c: Expression): ZetaToCharNum = copy(child = c)
}

/** FORMATDATETIME(ts, fmt) / TO_CHAR(ts, fmt). */
case class ZetaFormatDatetime(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "formatdatetime"
  override protected def nullSafeEval(ts: Any, fmt: Any): Any =
    ZetaNativeHelpers.formatdatetime(ts.asInstanceOf[Long], fmt.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (ts, f) => s"graft.functions.ZetaNativeHelpers.formatdatetime($ts, $f)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZetaFormatDatetime =
    copy(left = l, right = r)
}

/** PARSEDATETIME(s, fmt) — datetime, then date-only, then time-only. */
case class ZetaParseDatetime(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = TimestampType
  override def prettyName: String = "parsedatetime"
  override protected def nullSafeEval(str: Any, fmt: Any): Any =
    ZetaNativeHelpers.parsedatetime(str.asInstanceOf[UTF8String], fmt.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, f) => s"graft.functions.ZetaNativeHelpers.parsedatetime($s, $f)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZetaParseDatetime =
    copy(left = l, right = r)
}

/** IS_DATE(s, fmt). */
case class ZetaIsDate(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_date"
  override protected def nullSafeEval(str: Any, fmt: Any): Any =
    ZetaNativeHelpers.isDate(str.asInstanceOf[UTF8String], fmt.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, f) => s"graft.functions.ZetaNativeHelpers.isDate($s, $f)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZetaIsDate =
    copy(left = l, right = r)
}

/** DATEADD(ts, n, unit) — zeta argument order. */
case class ZetaDateAdd(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = TimestampType
  override def prettyName: String = "dateadd"
  override protected def nullSafeEval(ts: Any, n: Any, unit: Any): Any =
    ZetaNativeHelpers.dateadd(ts.asInstanceOf[Long], n.asInstanceOf[Long],
      unit.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (ts, n, u) => s"graft.functions.ZetaNativeHelpers.dateadd($ts, $n, $u)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZetaDateAdd =
    copy(first = f, second = s, third = t)
}

/** ZETA_DATEDIFF(a, b, unit) = b - a in unit. */
case class ZetaDateDiff(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zeta_datediff"
  override protected def nullSafeEval(a: Any, b: Any, unit: Any): Any =
    ZetaNativeHelpers.zetaDatediff(a.asInstanceOf[Long], b.asInstanceOf[Long],
      unit.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, u) => s"graft.functions.ZetaNativeHelpers.zetaDatediff($a, $b, $u)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZetaDateDiff =
    copy(first = f, second = s, third = t)
}

object ZetaNative {
  /** Register the native builders (replacing the former ScalaUDF
    * registrations for these names). DATEADD defaults its unit to DAY when
    * called with 2 args, matching the UDF's null-unit fallback.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")
    // Input coercions are explicit Casts (AbstractDataType/ExpectsInputTypes
    // is sql-private in Spark 4): the former ScalaUDFs coerced the same way
    // via their input encoders, and SimplifyCasts drops the no-op ones.
    def str(e: Expression) = Cast(e, StringType)
    def ts(e: Expression) = Cast(e, TimestampType)
    def dbl(e: Expression) = Cast(e, DoubleType)
    one("hextoraw") { case Seq(c) => ZetaStr1(str(c), "hextoraw") }
    one("rawtohex") { case Seq(c) => ZetaStr1(str(c), "rawtohex") }
    one("truncate") { case Seq(x, d) => ZetaTruncate(dbl(x), Cast(d, IntegerType)) }
    one("trunc_num") { case Seq(x, d) => ZetaTruncate(dbl(x), Cast(d, IntegerType)) }
    one("zeta_mod") { case Seq(a, b) => ZetaModExpr(dbl(a), dbl(b)) }
    one("to_char_num") { case Seq(x) => ZetaToCharNum(dbl(x)) }
    one("dayname") { case Seq(c) => ZetaTsToStr(ts(c), "dayname") }
    one("monthname") { case Seq(c) => ZetaTsToStr(ts(c), "monthname") }
    one("formatdatetime") { case Seq(t, f) => ZetaFormatDatetime(ts(t), str(f)) }
    one("parsedatetime") { case Seq(s, f) => ZetaParseDatetime(str(s), str(f)) }
    one("is_date") { case Seq(s, f) => ZetaIsDate(str(s), str(f)) }
    one("week") { case Seq(c) => ZetaTsToInt(ts(c), "week", "week") }
    one("zeta_week") { case Seq(c) => ZetaTsToInt(ts(c), "zeta_week", "zetaWeek") }
    one("zeta_day_of_week") { case Seq(c) => ZetaTsToInt(ts(c), "zeta_day_of_week", "zetaDayOfWeek") }
    one("day_of_month") { case Seq(c) => ZetaTsToInt(ts(c), "day_of_month", "dayOfMonth") }
    one("day_of_year") { case Seq(c) => ZetaTsToInt(ts(c), "day_of_year", "dayOfYear") }
    one("day_of_week") { case Seq(c) => ZetaTsToInt(ts(c), "day_of_week", "dayOfWeekH2") }
    def add(t: Expression, n: Expression, u: Expression) =
      ZetaDateAdd(ts(t), Cast(n, LongType), str(u))
    one("dateadd") {
      case Seq(t, n) => add(t, n, Literal(UTF8String.fromString("DAY"), StringType))
      case Seq(t, n, u) => add(t, n, u)
    }
    one("zeta_dateadd") {
      case Seq(t, n) => add(t, n, Literal(UTF8String.fromString("DAY"), StringType))
      case Seq(t, n, u) => add(t, n, u)
    }
    one("zeta_datediff") { case Seq(a, b, u) => ZetaDateDiff(ts(a), ts(b), str(u)) }
  }
}
