package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL transform.
  *
  * Reference: seatunnel-transforms-v2 .../sql/SQLTransform.java:47 — a
  * single-input SQL step evaluated row-at-a-time by the Zeta SQL engine
  * (JSQLParser + interpreted expressions; SELECT/WHERE + scalar functions +
  * LATERAL-VIEW EXPLODE only).
  *
  * Graft delegates to Spark SQL over temp views: the input table is
  * registered under its pipeline name and the query becomes part of the
  * same Catalyst plan as the rest of the pipeline (optimized + codegen'd
  * end-to-end, and a strict superset: joins, aggregation, windows, CTEs).
  * Zeta-specific function names are provided by
  * [[graft.functions.ZetaFunctions.register]].
  */
object SqlOp {

  /** Run `query` with `df` visible as table `inputName` — and as `dual`,
    * the implicit input-table alias the reference's Zeta SQL accepts
    * (its example configs write `FROM dual` regardless of plugin_input).
    */
  def sql(spark: SparkSession, df: DataFrame, query: String, inputName: String = "input"): DataFrame = {
    df.createOrReplaceTempView(inputName)
    if (inputName != "dual") df.createOrReplaceTempView("dual")
    spark.sql(query)
  }

  /** Multi-table variant: every catalog entry is visible by name. */
  def sql(spark: SparkSession, catalog: Map[String, DataFrame], query: String): DataFrame = {
    catalog.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    spark.sql(query)
  }
}
