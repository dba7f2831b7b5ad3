package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-driven synthetic data source.
  *
  * Reference: seatunnel-connectors-v2/connector-fake — FakeSource generates
  * `row.num` rows from a declared schema, used for demos/tests throughout
  * the reference docs.
  *
  * Graft generates on the cluster from `spark.range` (no driver-side rows,
  * parallelism = `slices`), with deterministic per-index generators so runs
  * are reproducible at any scale.
  */
object FakeSource {

  /** Supported field types: int, long, double, string, boolean, timestamp,
    * date. Generators are pure functions of the row index.
    */
  def generate(spark: SparkSession, fields: Seq[(String, String)], rows: Long,
      slices: Int = 4, seed: Long = 42): DataFrame = {
    val base = spark.range(0, rows, 1, slices)
    val cols: Seq[Column] = fields.map { case (name, tpe) =>
      val i = col("id")
      val mixed = hash(i.cast("string"), lit(seed)) // deterministic per-row mix
      (tpe.toLowerCase match {
        case "int" | "integer" => pmod(mixed, lit(1000000)).cast("int")
        case "long" | "bigint" => abs(xxhash64(i.cast("string"), lit(seed)))
        case "double" | "float" => (pmod(mixed, lit(1000000)).cast("double") / 1000.0)
        case "string" | "varchar" => concat(lit(s"${name}_"), i.cast("string"))
        case "boolean" => (i % 2 === 0)
        case "timestamp" => timestamp_seconds(lit(1704067200L) + pmod(mixed, lit(86400 * 365)))
        case "date" => to_date(timestamp_seconds(lit(1704067200L) + pmod(mixed, lit(86400 * 365))))
        case other => throw new IllegalArgumentException(s"FakeSource: unsupported type $other")
      }).as(name)
    }
    base.select(cols: _*)
  }
}
