package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-table ("catalog") operations over Map[tableName, DataFrame].
  *
  * Reference semantics:
  *  - TableMerge: seatunnel-transforms-v2 .../table/TableMergeTransform.java:27
  *    — route tables matching a pattern into one output table.
  *  - TableRename / TableFilter: .../table/ package — rename or select
  *    tables in a multi-table sync pipeline.
  *
  * unionByName(allowMissingColumns=true) aligns heterogeneous shards by
  * column name and null-fills gaps — each input stays a separate scan and
  * the union is a zero-shuffle narrow op.
  */
object TableOps {

  /** Merge all tables whose name matches `pattern` into `output`;
    * non-matching tables pass through unchanged.
    */
  def mergeTables(
      catalog: Map[String, DataFrame],
      pattern: String,
      output: String,
      tagSourceTable: Boolean = false): Map[String, DataFrame] = {
    val re = pattern.r
    val (matched, rest) = catalog.partition { case (name, _) => re.pattern.matcher(name).matches() }
    if (matched.isEmpty) rest
    else {
      val merged = matched.toSeq.sortBy(_._1).map { case (name, df) =>
        if (tagSourceTable) df.withColumn("__meta_table", lit(name)) else df
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      rest + (output -> merged)
    }
  }

  /** Rename tables (TableRenameTransform). Matches the reference options
    * (rename/TableRenameConfig.java: convert_case, prefix, suffix,
    * replacements_with_regex): explicit map first, then regex
    * replacements, then affixes, then case conversion.
    */
  def renameTables(
      catalog: Map[String, DataFrame],
      renames: Map[String, String] = Map.empty,
      prefix: String = "",
      suffix: String = "",
      convertCase: String = "",
      replacements: Seq[(String, String)] = Nil): Map[String, DataFrame] =
    catalog.map { case (name, df) =>
      renameOne(name, renames, prefix, suffix, convertCase, replacements) -> df
    }

  private[graft] def renameOne(name: String, renames: Map[String, String],
      prefix: String, suffix: String, convertCase: String,
      replacements: Seq[(String, String)]): String = {
    var n = renames.getOrElse(name, name)
    replacements.foreach { case (from, to) => n = n.replaceAll(from, to) }
    n = s"$prefix$n$suffix"
    convertCase.toUpperCase match {
      case "UPPER" => n.toUpperCase
      case "LOWER" => n.toLowerCase
      case _ => n
    }
  }

  /** Keep only tables matching one of the patterns (TableFilter include). */
  def filterTables(catalog: Map[String, DataFrame], patterns: Seq[String]): Map[String, DataFrame] = {
    val res = patterns.map(_.r)
    catalog.filter { case (name, _) => res.exists(_.pattern.matcher(name).matches()) }
  }
}
