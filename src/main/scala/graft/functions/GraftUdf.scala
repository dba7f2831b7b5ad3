package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java.{UDF1, UDF2}
import org.apache.spark.sql.types.DataType

/** User-defined SQL function SPI — Graft's analog of the reference's
  * ZetaUDF plugin interface (seatunnel-transforms-v2
  * .../sql/zeta/functions/udf + docs/en/transform-v2/sql-udf.md): drop a
  * function on the classpath, register it, call it from SQL transforms.
  *
  * Implementations declare a name, a return type, and an eval over boxed
  * arguments; `register` binds them into the session so `SqlOp` queries
  * can call them by name — same developer contract as the reference, but
  * the function runs inside Spark's deserialized-row UDF path instead of
  * the reference's per-row reflective dispatch.
  */
trait GraftUdf extends Serializable {
  def name: String
  def resultType: DataType
  def eval(args: Seq[Any]): Any
  /** Arity used for registration (Spark needs a fixed-arity binding). */
  def arity: Int = 1
}

object GraftUdf {

  def register(spark: SparkSession, udfs: GraftUdf*): Unit =
    udfs.foreach { u =>
      u.arity match {
        case 1 => spark.udf.register(u.name,
          new UDF1[Any, Any] { override def call(a: Any): Any = u.eval(Seq(a)) }, u.resultType)
        case 2 => spark.udf.register(u.name,
          new UDF2[Any, Any, Any] { override def call(a: Any, b: Any): Any = u.eval(Seq(a, b)) },
          u.resultType)
        case n => throw new IllegalArgumentException(s"GraftUdf arity $n not supported (1-2)")
      }
    }
}
