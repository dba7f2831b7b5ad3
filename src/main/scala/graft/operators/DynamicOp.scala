package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.StructType

/** User-code transform.
  *
  * Reference: seatunnel-transforms-v2
  * .../dynamiccompile/DynamicCompileTransform.java:38 — hot-compiles
  * user-supplied Java/Groovy source and invokes it per row via reflection.
  *
  * Graft's equivalent is a typed function the JVM JIT-compiles like any
  * other code: `Dataset.map` with case-class encoders (preferred — Tungsten
  * encodes/decodes once per row, no reflection), or a Row-level variant for
  * dynamic schemas. Where the user logic is expressible as Columns, prefer
  * `DataFrame.withColumns` so it stays in codegen.
  */
object DynamicOp {

  /** Typed row-function transform: the idiomatic DynamicCompile analog. */
  def applyTyped[T: Encoder, U: Encoder](ds: Dataset[T], fn: T => U): Dataset[U] =
    ds.map(fn)

  /** Dynamic-schema variant: Row => Row with an explicit output schema. */
  def applyRows(df: DataFrame, outSchema: StructType, fn: Row => Row): DataFrame = {
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    df.map(fn)
  }

  /** Per-partition variant for logic with expensive setup (the reference's
    * compiled-instance-per-task pattern); setup runs once per partition.
    */
  def applyPartitions(df: DataFrame, outSchema: StructType, fn: Iterator[Row] => Iterator[Row]): DataFrame = {
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    df.mapPartitions(fn)
  }

  /** True hot-compile analog of the reference's DynamicCompileTransform:
    * `source` is Scala source for a `Row => Row` function, compiled ON THE
    * EXECUTOR the first time each JVM sees it (per-JVM cache) — the same
    * ship-source/compile-per-node model the reference uses for its
    * Java/Groovy snippets, so nothing needs to be on the driver classpath.
    */
  def applyCompiled(df: DataFrame, outSchema: StructType, source: String): DataFrame = {
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val fn = CompiledFunctions.rowFunction(source)
      rows.map(fn)
    }
  }
}

/** Executor-side compilation cache for [[DynamicOp.applyCompiled]]. */
object CompiledFunctions {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Row => Row]()

  def rowFunction(source: String): Row => Row =
    cache.computeIfAbsent(source, { src =>
      import scala.reflect.runtime.universe
      import scala.tools.reflect.ToolBox
      val tb = universe.runtimeMirror(getClass.getClassLoader).mkToolBox()
      tb.eval(tb.parse(src)).asInstanceOf[Row => Row]
    })
}
