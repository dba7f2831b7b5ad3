package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass dataset profiling (SURVEY §2.6 tooling): per-column null
  * counts, distinct estimates, and extremes — the summary a pipeline
  * health check wants before/after every transform stage.
  *
  * Scale shape: ONE aggregation pass over the input produces every
  * column's stats simultaneously (a naive per-column loop would scan a
  * 100 TB table once per column); the result unpivots driver-side from a
  * single collected row — O(columns), not O(rows). Distinct counts use
  * HyperLogLog++ (`approx_count_distinct`) so no per-column shuffle.
  */
object Profile {

  private val profileSchema = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("approx_distinct", LongType, nullable = false),
    StructField("min_str", StringType), StructField("max_str", StringType),
    StructField("mean_numeric", DoubleType)))

  /** Returns one row per profiled column. `mean_numeric` is null for
    * non-numeric columns.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs = count(lit(1)).as("__n") +: names.flatMap { c =>
      val base = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        approx_count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
      fields(c) match {
        case _: NumericType => base :+ avg(col(c).cast("double")).as(s"__mean_$c")
        case _ => base
      }
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    val out = names.map { c =>
      val mean: Any = fields(c) match {
        case _: NumericType => row.getAs[Any](s"__mean_$c")
        case _ => null
      }
      Row(c, n, row.getAs[Long](s"__nulls_$c"), row.getAs[Long](s"__dist_$c"),
        row.getAs[String](s"__min_$c"), row.getAs[String](s"__max_$c"), mean)
    }
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
      profileSchema)
  }

  private val exactSchema = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("min_str", StringType), StructField("max_str", StringType)))

  /** SQL-exact subset of the profile (no HLL): per-column null count and
    * min/max as strings — cross-engine reproducible for oracle checks.
    */
  def profileExact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    val out = cols.map { c =>
      Row(c, n, row.getAs[Long](s"__nulls_$c"),
        row.getAs[String](s"__min_$c"), row.getAs[String](s"__max_$c"))
    }
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
      exactSchema)
  }
}
