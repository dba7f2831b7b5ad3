package graft.functions

import java.time.LocalTime

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{DateTimeUtils, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Zeta-semantics expressions that can't be composed from Spark builtins
  * because their result TYPE depends on the resolved child types in a way
  * Spark's coercion rules don't reproduce.
  *
  * All are CodegenFallback: they exist for reference-config fidelity (the
  * Zeta SQL dialect path, [[graft.operators.SqlOp.sqlZeta]]) where inputs
  * are config-sized, not for the 100 TB hot path — hot-path array/cast work
  * stays on Spark's native codegen'd expressions.
  */
object ZetaExprs {

  /** Zeta ARRAY(...): element type is the zeta common type — identical
    * types kept; numeric mixes widened Short<Int<Long<Float<Double;
    * anything else (string involved, decimal, mixed non-numeric) → string.
    * Reference: seatunnel-transforms-v2 .../sql/zeta/functions/
    * ArrayFunction.java:83-121 (getArrayType/getNumericCommonType: numeric
    * ranking, `return String.class` fallback).
    *
    * Spark's own array() would coerce ('a', 123) to array<bigint> (string
    * promoted to numeric) — zeta goes the other way, to array<string>.
    */
  case class ZetaArray(children: Seq[Expression]) extends Expression with CodegenFallback {
    private val numericRank: Map[DataType, Int] = Map(
      ShortType -> 0, IntegerType -> 1, LongType -> 2, FloatType -> 3, DoubleType -> 4)

    lazy val elementType: DataType = {
      val ts = children.map(_.dataType).filterNot(_ == NullType).distinct
      ts match {
        case Seq() => StringType // all-null / empty -> String (ArrayFunction.java:135)
        case Seq(one) => one
        case many if many.forall(numericRank.contains) =>
          many.maxBy(numericRank)
        case _ => StringType
      }
    }

    override def dataType: DataType = ArrayType(elementType, containsNull = true)
    override def nullable: Boolean = false
    override def prettyName: String = "zeta_array"

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val out = new Array[Any](children.length)
      var i = 0
      while (i < children.length) {
        out(i) = convert(children(i).eval(input), children(i).dataType)
        i += 1
      }
      new GenericArrayData(out)
    }

    private def convert(v: Any, from: DataType): Any =
      if (v == null) null
      else elementType match {
        case StringType => UTF8String.fromString(scalaString(v, from))
        case DoubleType => numberOf(v, from).doubleValue()
        case FloatType => numberOf(v, from).floatValue()
        case LongType => numberOf(v, from).longValue()
        case IntegerType => numberOf(v, from).intValue()
        case ShortType => numberOf(v, from).shortValue()
        case _ => v // identical types: pass through
      }

    private def numberOf(v: Any, from: DataType): Number = v match {
      case n: Number => n
      case other => throw new IllegalArgumentException(
        s"zeta_array: non-numeric $other of ${from.simpleString} in numeric array")
    }

    private def scalaString(v: Any, from: DataType): String = (v, from) match {
      case (u: UTF8String, _) => u.toString
      case (d: Decimal, _) => d.toJavaBigDecimal.toPlainString
      case (other, _) => String.valueOf(other)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  private def intDigits(v: Long): String = v.toString

  /** Zeta CAST(x AS TIMESTAMP): integral input = epoch MILLIS (reference
    * SystemFunction castAsTimestamp; Spark's cast would read seconds).
    * Strings/dates/timestamps behave like Spark's cast.
    */
  case class ZetaCastTimestamp(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = TimestampType
    override def prettyName: String = "zeta_cast_timestamp"
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any = child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        v.asInstanceOf[Number].longValue() * 1000L // millis -> micros
      case TimestampType | TimestampNTZType => v
      case DateType => DateTimeUtils.daysToMicros(v.asInstanceOf[Int],
        java.time.ZoneId.systemDefault())
      case StringType =>
        DateTimeUtils.stringToTimestamp(v.asInstanceOf[UTF8String],
          java.time.ZoneId.systemDefault()).getOrElse(null)
      case other => throw new IllegalArgumentException(
        s"zeta_cast_timestamp: unsupported input ${other.simpleString}")
    }
    override protected def withNewChildInternal(newChild: Expression): ZetaCastTimestamp =
      copy(child = newChild)
  }

  /** Zeta CAST(x AS DATE): integral input parses its decimal digits as
    * yyyyMMdd (reference e2e func_system.conf: 20230625 -> 2023-06-25).
    */
  case class ZetaCastDate(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DateType
    override def prettyName: String = "zeta_cast_date"
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any = child.dataType match {
      case LongType | IntegerType =>
        val s = intDigits(v.asInstanceOf[Number].longValue())
        require(s.length == 8, s"zeta_cast_date: expected yyyyMMdd digits, got $s")
        val ld = java.time.LocalDate.of(s.take(4).toInt, s.slice(4, 6).toInt, s.drop(6).toInt)
        ld.toEpochDay.toInt
      case DateType => v
      case TimestampType | TimestampNTZType =>
        DateTimeUtils.microsToDays(v.asInstanceOf[Long], java.time.ZoneId.systemDefault())
      case StringType =>
        DateTimeUtils.stringToDate(v.asInstanceOf[UTF8String]).getOrElse(null)
      case other => throw new IllegalArgumentException(
        s"zeta_cast_date: unsupported input ${other.simpleString}")
    }
    override protected def withNewChildInternal(newChild: Expression): ZetaCastDate =
      copy(child = newChild)
  }

  /** Zeta CAST(x AS TIME): integral input parses digits as HHmmss
    * (reference e2e func_system.conf: 235109 -> 23:51:09). Produces the
    * Spark 4 TIME type (nanos-of-day).
    */
  case class ZetaCastTime(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = TimeType()
    override def prettyName: String = "zeta_cast_time"
    override def nullable: Boolean = true
    private def toNanos(lt: LocalTime): Long = lt.toNanoOfDay
    override protected def nullSafeEval(v: Any): Any = child.dataType match {
      case LongType | IntegerType =>
        val digits = intDigits(v.asInstanceOf[Number].longValue())
        val s = ("0" * math.max(0, 6 - digits.length)) + digits
        require(s.length == 6, s"zeta_cast_time: expected HHmmss digits, got $digits")
        toNanos(LocalTime.of(s.take(2).toInt, s.slice(2, 4).toInt, s.drop(4).toInt))
      case _: TimeType => v
      case StringType => toNanos(LocalTime.parse(v.asInstanceOf[UTF8String].toString))
      case TimestampType | TimestampNTZType =>
        val micros = v.asInstanceOf[Long]
        Math.floorMod(micros, 86400000000L) * 1000L // micros-of-day -> nanos
      case other => throw new IllegalArgumentException(
        s"zeta_cast_time: unsupported input ${other.simpleString}")
    }
    override protected def withNewChildInternal(newChild: Expression): ZetaCastTime =
      copy(child = newChild)
  }
}
