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
      renameTablePath(name, renames, prefix, suffix, convertCase, replacements) -> df
    }

  private def caseOf(convertCase: String)(n: String): String =
    convertCase.toUpperCase match {
      case "UPPER" => n.toUpperCase
      case "LOWER" => n.toLowerCase
      case _ => n
    }

  /** Reference convertName (rename/TableRenameTransform.java:165 and
    * rename/FieldRenameTransform.java:127): an explicit rename wins
    * outright; otherwise regex match positions are found on the ORIGINAL
    * name, case conversion applies, then the replacement text is spliced
    * at the matched positions (so `abc` + UPPER + c->CC = `ABCC`, the
    * replacement surviving case conversion), then prefix/suffix attach
    * unconverted. The LAST replacement entry with any match wins.
    */
  private[graft] def renameOne(name: String, renames: Map[String, String],
      prefix: String, suffix: String, convertCase: String,
      replacements: Seq[(String, String)]): String = {
    renames.get(name) match {
      case Some(target) => return target
      case None =>
    }
    var replaceTo: String = null
    var ranges: Seq[(Int, Int)] = Nil
    replacements.foreach { case (from, to) =>
      if (from.nonEmpty) {
        val m = java.util.regex.Pattern.compile(from).matcher(name)
        val found = Seq.newBuilder[(Int, Int)]
        var any = false
        while (m.find()) { found += ((m.start, m.end)); any = true }
        if (any) { replaceTo = to; ranges = found.result() }
      }
    }
    var n = caseOf(convertCase)(name)
    var offset = 0
    ranges.foreach { case (s0, e0) =>
      n = n.substring(0, s0 + offset) + replaceTo.trim + n.substring(e0 + offset)
      offset += replaceTo.trim.length - (e0 - s0)
    }
    if (prefix.trim.nonEmpty) n = prefix.trim + n
    if (suffix.trim.nonEmpty) n = n + suffix.trim
    n
  }

  /** TableRename over a catalog path `db.table`: affixes and replacements
    * apply to the table part only; database/schema parts get case
    * conversion only (reference TableRenameTransform.java:79-94).
    */
  private[graft] def renameTablePath(path: String, renames: Map[String, String],
      prefix: String, suffix: String, convertCase: String,
      replacements: Seq[(String, String)]): String = {
    val cut = path.lastIndexOf('.')
    if (cut < 0) renameOne(path, renames, prefix, suffix, convertCase, replacements)
    else {
      val db = caseOf(convertCase)(path.substring(0, cut))
      val table = renameOne(path.substring(cut + 1), renames, prefix, suffix,
        convertCase, replacements)
      s"$db.$table"
    }
  }

  /** Keep only tables matching one of the patterns (TableFilter include). */
  def filterTables(catalog: Map[String, DataFrame], patterns: Seq[String]): Map[String, DataFrame] = {
    val res = patterns.map(_.r)
    catalog.filter { case (name, _) => res.exists(_.pattern.matcher(name).matches()) }
  }
}
