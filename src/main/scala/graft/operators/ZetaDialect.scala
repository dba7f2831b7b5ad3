package graft.operators

/** Source-level shims that make the reference's Zeta SQL dialect parse and
  * evaluate with Zeta semantics on Spark SQL. Applied only on the config
  * path ([[SqlOp.sqlZeta]], used by the Pipeline SQL transform) — driver
  * queries written against Spark SQL keep Spark semantics.
  *
  * The shims (each mirrors a documented Zeta behavior):
  *  1. fractional literals are DOUBLE (JSQLParser DoubleValue), not
  *     Spark's DECIMAL — `price%23.12` must be double fmod (the reference
  *     e2e binary_expression.conf asserts 18.619999999999994);
  *  2. `ARRAY(...)` uses zeta element-type unification (string fallback)
  *     — rewritten to `zeta_array(...)`;
  *  3. `CAST(x AS DATE|TIME|TIMESTAMP)` uses zeta's digit-parsing for
  *     integral inputs — rewritten to `zeta_cast_*` (ZetaExprs);
  *  4. trailing `LATERAL VIEW [OUTER] EXPLODE(e) AS alias` clauses REPLACE
  *     the same-named column (zeta row-expansion semantics; Spark's
  *     LATERAL VIEW would append a second column) and non-OUTER EXPLODE
  *     drops null elements (e2e explode_transform_without_outer.conf:
  *     EXPLODE(ARRAY(1,1,null)) yields 2 rows) — extracted here and
  *     applied as `withColumn(alias, explode(...))` by SqlOp.
  *
  * All rewrites skip single-quoted SQL string literals.
  */
object ZetaDialect {

  final case class Lateral(outer: Boolean, expr: String, alias: String)

  /** Split trailing LATERAL VIEW clauses off `query`; returns the base
    * query and the laterals in declaration order.
    */
  def splitLaterals(query: String): (String, Seq[Lateral]) = {
    val lower = query.toLowerCase
    val laterals = Seq.newBuilder[Lateral]
    val kept = new StringBuilder
    var i = 0
    while (i < query.length) {
      if (inQuote(lower, i)) { kept.append(query.charAt(i)); i += 1 }
      else if (lower.startsWith("lateral", i) && wordBoundary(lower, i, 7)) {
        var j = skipWs(lower, i + 7)
        require(lower.startsWith("view", j), s"zeta sql: expected VIEW after LATERAL at $j")
        j = skipWs(lower, j + 4)
        val outer = lower.startsWith("outer", j) && wordBoundary(lower, j, 5)
        if (outer) j = skipWs(lower, j + 5)
        require(lower.startsWith("explode", j),
          s"zeta sql: only EXPLODE lateral views are supported (at $j)")
        j = skipWs(lower, j + 7)
        require(j < query.length && query.charAt(j) == '(', "zeta sql: EXPLODE needs (")
        val close = matchParen(query, j)
        val arr = query.substring(j + 1, close).trim
        j = skipWs(lower, close + 1)
        if (lower.startsWith("as", j) && wordBoundary(lower, j, 2)) j = skipWs(lower, j + 2)
        val aliasEnd = {
          var k = j
          while (k < query.length && (query.charAt(k).isLetterOrDigit || query.charAt(k) == '_')) k += 1
          k
        }
        require(aliasEnd > j, s"zeta sql: EXPLODE alias missing at $j")
        laterals += Lateral(outer, arr, query.substring(j, aliasEnd))
        i = aliasEnd
      } else { kept.append(query.charAt(i)); i += 1 }
    }
    (kept.toString, laterals.result())
  }

  /** Apply rewrites 1-3 (doubles, zeta_array, zeta casts). */
  def rewrite(query: String): String =
    rewriteCasts(rewriteArrays(rewriteDoubles(query)))

  private[operators] def rewriteDoubles(q: String): String =
    mapOutsideQuotes(q) { seg =>
      // bare fractional literal -> explicit double (not Spark decimal)
      seg.replaceAll("(?<![\\w.'])(\\d+\\.\\d+)(?![\\w.])", "CAST('$1' AS DOUBLE)")
    }

  private[operators] def rewriteArrays(q: String): String =
    mapOutsideQuotes(q)(_.replaceAll("(?i)(?<![\\w.])array\\s*\\(", "zeta_array("))

  /** CAST(expr AS DATE|TIME|TIMESTAMP) -> zeta_cast_*(expr); iterates so
    * nested casts resolve innermost-last.
    */
  private[operators] def rewriteCasts(q: String): String = {
    var cur = q
    var changed = true
    while (changed) {
      changed = false
      val lower = cur.toLowerCase
      var i = 0
      var done = false
      while (i < lower.length && !done) {
        if (!inQuote(lower, i) && lower.startsWith("cast", i) && wordBoundary(lower, i, 4)) {
          val open = skipWs(lower, i + 4)
          if (open < cur.length && cur.charAt(open) == '(') {
            val close = matchParen(cur, open)
            val inner = cur.substring(open + 1, close)
            lastTopLevelAs(inner).foreach { asPos =>
              val target = inner.substring(asPos + 4).trim.toLowerCase
              if (target == "date" || target == "time" || target == "timestamp") {
                val exprStr = inner.substring(0, asPos)
                cur = cur.substring(0, i) + s"zeta_cast_$target(" + exprStr + ")" +
                  cur.substring(close + 1)
                changed = true
                done = true
              }
            }
          }
        }
        i += 1
      }
    }
    cur
  }

  /** Offset of the last top-level ` as ` (ci) inside a cast body, or None. */
  private def lastTopLevelAs(s: String): Option[Int] = {
    val lower = s.toLowerCase
    var depth = 0
    var found = -1
    var i = 0
    while (i < lower.length) {
      if (inQuote(lower, i)) ()
      else lower.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ' ' if depth == 0 && lower.startsWith(" as ", i) => found = i
        case _ => ()
      }
      i += 1
    }
    if (found >= 0) Some(found) else None
  }

  // --- scanning helpers ---

  /** Is offset `i` inside a single-quoted SQL string literal? (Simple
    * backward parity scan; '' escapes pair up so parity still works.)
    */
  private def inQuote(s: String, i: Int): Boolean = {
    var q = false
    var k = 0
    while (k < i) { if (s.charAt(k) == '\'') q = !q; k += 1 }
    q
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }

  private def wordBoundary(s: String, start: Int, len: Int): Boolean = {
    val before = start == 0 || !(s.charAt(start - 1).isLetterOrDigit || s.charAt(start - 1) == '_')
    val after = start + len >= s.length ||
      !(s.charAt(start + len).isLetterOrDigit || s.charAt(start + len) == '_')
    before && after
  }

  /** Index of the ')' matching the '(' at `open`, quote-aware. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inq = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inq = !inq
      else if (!inq && c == '(') depth += 1
      else if (!inq && c == ')') {
        depth -= 1
        if (depth == 0) return i
      }
      i += 1
    }
    throw new IllegalArgumentException(s"zeta sql: unbalanced parens from $open")
  }

  /** Map `f` over the segments of `q` outside single-quoted literals. */
  private def mapOutsideQuotes(q: String)(f: String => String): String = {
    val sb = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c == '\'') {
        sb.append(f(seg.toString)); seg.clear()
        sb.append(c); i += 1
        while (i < q.length && q.charAt(i) != '\'') { sb.append(q.charAt(i)); i += 1 }
        if (i < q.length) { sb.append('\''); i += 1 }
      } else { seg.append(c); i += 1 }
    }
    sb.append(f(seg.toString))
    sb.toString
  }
}
