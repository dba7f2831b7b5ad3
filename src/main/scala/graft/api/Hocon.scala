package graft.api

/** Minimal HOCON-subset parser for SeaTunnel job configs (the reference's
  * native config syntax — every file under the reference's
  * seatunnel-examples/ and docs uses it). Written from the public HOCON
  * grammar; covers the subset job configs actually use:
  *  - `#` and `//` line comments,
  *  - objects `{ k = v, ... }` with `=` or `:` separators and
  *    newline-or-comma entry separation,
  *  - arrays `[ v, ... ]`,
  *  - quoted and unquoted scalars (unquoted run to , } ] or newline),
  *  - dotted keys kept LITERAL (`job.mode` stays one key, matching the
  *    reference's env options),
  *  - repeated keys preserved in order (a source block may declare the
  *    same plugin twice).
  *
  * Scalars parse to String; callers coerce (Plugin.int/bool already do).
  */
object Hocon {

  sealed trait Value
  final case class Obj(entries: Seq[(String, Value)]) extends Value {
    def get(key: String): Option[Value] = entries.find(_._1 == key).map(_._2)
  }
  final case class Arr(values: Seq[Value]) extends Value
  final case class Scalar(text: String) extends Value
  /** Unquoted `null` literal (quoted "null" stays a Scalar). */
  case object Null extends Value

  def parse(text: String): Obj = {
    val p = new Parser(strip(text))
    val o = p.parseObjectBody(topLevel = true)
    p.skipWs()
    require(p.eof, s"hocon: trailing content at offset ${p.pos}")
    o
  }

  private val VarRe = """\$\{([A-Za-z0-9_.-]+)(?::([^}]*))?\}""".r

  /** The reference's CLI job variables (`-i name=value`, docs
    * "variable substitution"): `${name}` placeholders in the config text
    * resolve from `vars`, `${name:default}` falls back to the default.
    * Textual pre-pass, exactly like the reference applies it before
    * config parse.
    */
  def substituteVariables(text: String, vars: Map[String, String]): String =
    VarRe.replaceAllIn(text, m => {
      val value = vars.get(m.group(1)).orElse(Option(m.group(2))).getOrElse(
        throw new IllegalArgumentException(
          s"hocon: unbound variable $${${m.group(1)}} (no -i value, no default)"))
      java.util.regex.Matcher.quoteReplacement(value)
    })

  /** Remove comments (outside quotes) while preserving newlines. Triple-
    * quoted `"""..."""` blocks (HOCON multiline strings, used by the
    * reference's sql_transform e2e configs) pass through verbatim.
    */
  private def strip(text: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (inStr) {
        sb.append(c)
        if (c == '"' && text.charAt(i - 1) != '\\') inStr = false
        i += 1
      } else if (c == '"' && text.startsWith("\"\"\"", i)) {
        val end = text.indexOf("\"\"\"", i + 3)
        require(end >= 0, "hocon: unterminated triple-quoted string")
        sb.append(text.substring(i, end + 3))
        i = end + 3
      } else if (c == '"') { inStr = true; sb.append(c); i += 1 }
      else if (c == '#' || (c == '/' && i + 1 < text.length && text.charAt(i + 1) == '/')) {
        while (i < text.length && text.charAt(i) != '\n') i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    private def cur: Char = s.charAt(pos)

    def skipWs(): Unit = while (!eof && cur.isWhitespace) pos += 1
    private def skipInlineWs(): Unit =
      while (!eof && (cur == ' ' || cur == '\t' || cur == '\r')) pos += 1

    /** Object body; `topLevel` bodies have no surrounding braces. */
    def parseObjectBody(topLevel: Boolean): Obj = {
      val entries = Seq.newBuilder[(String, Value)]
      skipWs()
      while (!eof && cur != '}') {
        val key = parseKey()
        skipInlineWs()
        val value =
          if (!eof && (cur == '=' || cur == ':')) { pos += 1; skipWs(); parseValue() }
          else if (!eof && cur == '{') parseValue() // `Key { ... }` block form
          else throw new IllegalArgumentException(
            s"hocon: expected '=', ':' or '{' after key '$key' at offset $pos")
        entries += key -> value
        skipWs()
        if (!eof && cur == ',') { pos += 1; skipWs() }
      }
      if (!topLevel) {
        require(!eof && cur == '}', s"hocon: expected '}' at offset $pos")
        pos += 1
      }
      Obj(entries.result())
    }

    private def parseKey(): String = {
      skipWs()
      if (cur == '"') parseQuoted()
      else {
        val start = pos
        while (!eof && !cur.isWhitespace && cur != '=' && cur != ':' && cur != '{') pos += 1
        require(pos > start, s"hocon: empty key at offset $pos")
        s.substring(start, pos)
      }
    }

    def parseValue(): Value = {
      skipWs()
      cur match {
        case '"' if s.startsWith("\"\"\"", pos) =>
          val end = s.indexOf("\"\"\"", pos + 3)
          require(end >= 0, "hocon: unterminated triple-quoted string")
          val body = s.substring(pos + 3, end)
          pos = end + 3
          Scalar(body)
        case '{' => pos += 1; parseObjectBody(topLevel = false)
        case '[' =>
          pos += 1
          val vs = Seq.newBuilder[Value]
          skipWs()
          while (!eof && cur != ']') {
            vs += parseValue()
            skipWs()
            if (!eof && cur == ',') { pos += 1; skipWs() }
          }
          require(!eof, "hocon: unterminated array")
          pos += 1
          Arr(vs.result())
        case '"' =>
          // may be a lone quoted string or the head of a value
          // concatenation (HOCON adjacent-value concat)
          val start = pos
          val content = parseQuoted()
          skipInlineWs()
          if (eof || cur == ',' || cur == '\n' || cur == '}' || cur == ']') Scalar(content)
          else Scalar(rawConcat(start))
        case _ =>
          val start = pos
          var sawQuote = false
          while (!eof && cur != ',' && cur != '\n' && cur != '}' && cur != ']' && cur != '"')
            pos += 1
          if (!eof && cur == '"') { sawQuote = true }
          if (sawQuote) Scalar(rawConcat(start))
          else {
            val text = s.substring(start, pos).trim
            if (text == "null") Null else Scalar(text)
          }
      }
    }

    /** HOCON value concatenation. Two config idioms meet here:
      *
      *  - typesafe content-concat (the general rule): adjacent quoted and
      *    unquoted segments join by CONTENT — `"select * from "tbl" ..."`
      *    (the reference's CLI-variables configs after substitution)
      *    becomes one SQL string with the quote delimiters consumed;
      *  - the e2e `string.template` JSON-document idiom
      *    (`["{"data":{"c_string": ...\"}}"]`): the reference parses the
      *    content-concat result with a LENIENT json parser. Graft instead
      *    keeps the quote characters in place (stripping one outer pair),
      *    reconstructing the strict-JSON document — the form
      *    `get_json_object` can consume, with the same observable values.
      *    Detected by the concatenation opening with `"{`.
      */
    private def rawConcat(start: Int): String = {
      pos = start
      val jsonMode = s.charAt(start) == '"' &&
        start + 1 < s.length && s.charAt(start + 1) == '{'
      val sb = new StringBuilder
      var inQuote = false
      var done = false
      while (!eof && !done) {
        val c = cur
        if (inQuote) {
          if (c == '\\' && pos + 1 < s.length) {
            pos += 1
            sb.append(cur match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
          } else {
            if (c == '"') { inQuote = false; if (jsonMode) sb.append(c) }
            else sb.append(c)
          }
          pos += 1
        } else if (c == ',' || c == '\n' || c == '}' || c == ']') {
          done = true
        } else {
          if (c == '"') { inQuote = true; if (jsonMode) sb.append(c) }
          else sb.append(c)
          pos += 1
        }
      }
      val text = sb.toString.trim
      if (jsonMode && text.length >= 2 && text.head == '"' && text.last == '"')
        text.substring(1, text.length - 1)
      else text
    }

    private def parseQuoted(): String = {
      require(cur == '"')
      pos += 1
      val sb = new StringBuilder
      while (!eof && cur != '"') {
        if (cur == '\\' && pos + 1 < s.length) {
          pos += 1
          sb.append(cur match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case other => other
          })
        } else sb.append(cur)
        pos += 1
      }
      require(!eof, "hocon: unterminated string")
      pos += 1
      sb.toString
    }
  }

  /** Convert a parsed value to the plain Scala shapes Pipeline options
    * use. Objects become insertion-ordered ListMaps — option blocks like
    * field_mapper are order-significant in the reference.
    */
  def toPlain(v: Value): Any = v match {
    case Null => null
    case Obj(entries) =>
      scala.collection.immutable.ListMap(entries.map { case (k, x) => k -> toPlain(x) }: _*)
    case Arr(vs) => vs.map(toPlain)
    case Scalar(t) => t
  }
}
