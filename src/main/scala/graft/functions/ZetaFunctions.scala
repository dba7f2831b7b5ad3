package graft.functions

import java.sql.Timestamp
import java.time.{LocalDate, LocalDateTime, LocalTime}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.SparkSession

/** SeaTunnel Zeta SQL scalar-function compatibility layer.
  *
  * Reference: seatunnel-transforms-v2 .../sql/zeta/ZetaSQLFunction.java and
  * .../sql/zeta/functions/{String,Numeric,DateTime,System}Function.java.
  *
  * Most zeta function names ARE Spark builtins (ABS..TANH, ASCII, CONCAT,
  * LPAD, REGEXP_*, SOUNDEX, SPLIT, TRANSLATE, UUID, COALESCE, NULLIF,
  * IFNULL, EXTRACT, DATE_TRUNC, FROM_UNIXTIME, HOUR..YEAR, ...) and resolve
  * to codegen'd Catalyst expressions untouched. `register` adds only the
  * names Spark lacks (or where zeta argument order differs), so reference
  * SQL runs verbatim through [[graft.operators.SqlOp]].
  *
  * Registered functions are Scala UDFs — acceptable here because each is a
  * scalar leaf, not a hot aggregation path; null-in → null-out is handled
  * by Spark's primitive-null bypass. Sessions must keep
  * spark.sql.datetime.java8API.enabled=false (Graft's builders do) so
  * temporal UDF args arrive as java.sql.Timestamp/Date.
  *
  * Zeta-order caveats (documented reference fidelity):
  *  - DATEADD(ts, n, unit)  — StringFunction-style zeta order
  *    (docs/en/transform-v2/sql-functions.md: "DATEADD(dateAndTime,
  *    addIntLong, datetimeFieldString)"); Spark's native
  *    timestampadd(unit, n, ts) remains available.
  *  - ZETA_DATEDIFF(a, b, unit) = b - a in unit (DateTimeFunction.java:143);
  *    Spark's datediff(end, start) builtin is left untouched.
  */
object ZetaFunctions {

  // ---- string ----

  /** StringFunction.java:132 — 4 hex digits per char. */
  def hextoraw(s: String): String =
    if (s == null) null
    else {
      require(s.length % 4 == 0, s"HEXTORAW needs length % 4 == 0, got ${s.length}")
      val sb = new StringBuilder(s.length / 4)
      var i = 0
      while (i < s.length) {
        sb.append(Integer.parseInt(s.substring(i, i + 4), 16).toChar)
        i += 4
      }
      sb.toString
    }

  /** StringFunction.java:150 — each char to 4 hex digits. */
  def rawtohex(s: String): String =
    if (s == null) null
    else {
      val sb = new StringBuilder(4 * s.length)
      s.foreach(c => sb.append(f"${c.toInt}%04x"))
      sb.toString
    }

  /** StringFunction.java:180 — H2 INSERT(s, start(1-based), len, repl). */
  def insertStr(s1: String, start0: Int, length0: Int, s2: String): String = {
    if (s1 == null) return s2
    if (s2 == null) return s1
    val len1 = s1.length
    val start = start0 - 1
    var length = length0
    if (start < 0 || length <= 0 || s2.isEmpty || start > len1) return s1
    if (start + length > len1) length = len1 - start
    s1.substring(0, start) + s2 + s1.substring(start + length)
  }

  // ---- datetime ----

  private def toLdt(ts: Timestamp): LocalDateTime = ts.toLocalDateTime

  private def addUnit(ldt: LocalDateTime, n: Long, unit: String): LocalDateTime =
    unit.toUpperCase match {
      case "YEAR" => ldt.plusYears(n)
      case "MONTH" => ldt.plusMonths(n)
      case "WEEK" => ldt.plusWeeks(n)
      case "DAY" | "" => ldt.plusDays(n)
      case "HOUR" => ldt.plusHours(n)
      case "MINUTE" => ldt.plusMinutes(n)
      case "SECOND" => ldt.plusSeconds(n)
      case "MILLISECOND" => ldt.plus(n, ChronoUnit.MILLIS)
      case u => throw new IllegalArgumentException(s"DATEADD: unsupported unit $u")
    }

  /** DateTimeFunction.java:55 — DATEADD(ts, n, unit), zeta argument order. */
  def dateadd(ts: Timestamp, n: Long, unit: String): Timestamp =
    if (ts == null) null else Timestamp.valueOf(addUnit(toLdt(ts), n, if (unit == null) "DAY" else unit))

  /** DateTimeFunction.java:143 — ZETA_DATEDIFF(a, b, unit) = b - a. */
  def zetaDatediff(a: Timestamp, b: Timestamp, unit: String): java.lang.Long = {
    if (a == null || b == null) return null
    val (la, lb) = (toLdt(a), toLdt(b))
    val u = if (unit == null) "DAY" else unit.toUpperCase
    u match {
      case "YEAR" => java.time.Period.between(la.toLocalDate, lb.toLocalDate).getYears.toLong
      case "MONTH" => java.time.Period.between(la.toLocalDate, lb.toLocalDate).getMonths.toLong
      case "DAY" => ChronoUnit.DAYS.between(la.toLocalDate, lb.toLocalDate)
      case "WEEK" => ChronoUnit.WEEKS.between(la.toLocalDate, lb.toLocalDate)
      case "HOUR" => ChronoUnit.HOURS.between(la, lb)
      case "MINUTE" => ChronoUnit.MINUTES.between(la, lb)
      case "SECOND" => ChronoUnit.SECONDS.between(la, lb)
      case other => throw new IllegalArgumentException(s"DATEDIFF: unsupported unit $other")
    }
  }

  /** DateTimeFunction.java:278 — full English day name. */
  def dayname(ts: Timestamp): String =
    if (ts == null) null
    else toLdt(ts).getDayOfWeek.getDisplayName(java.time.format.TextStyle.FULL, java.util.Locale.ENGLISH)

  /** DateTimeFunction.java:465 — full English month name. */
  def monthname(ts: Timestamp): String =
    if (ts == null) null
    else toLdt(ts).getMonth.getDisplayName(java.time.format.TextStyle.FULL, java.util.Locale.ENGLISH)

  /** DateTimeFunction.java:418 — java.time pattern formatting. */
  def formatdatetime(ts: Timestamp, fmt: String): String =
    if (ts == null || fmt == null) null
    else DateTimeFormatter.ofPattern(fmt).format(toLdt(ts))

  /** DateTimeFunction.java:484 — parse with a java.time pattern; falls back
    * from datetime to date-only to time-only patterns.
    */
  def parsedatetime(s: String, fmt: String): Timestamp = {
    if (s == null || fmt == null) return null
    val df = DateTimeFormatter.ofPattern(fmt)
    try Timestamp.valueOf(LocalDateTime.parse(s, df))
    catch {
      case _: Exception =>
        try Timestamp.valueOf(LocalDate.parse(s, df).atStartOfDay)
        catch {
          case _: Exception =>
            Timestamp.valueOf(LocalTime.parse(s, df).atDate(LocalDate.of(1970, 1, 1)))
        }
    }
  }

  /** DateTimeFunction.java:475 — does the string parse under the pattern. */
  def isDate(s: String, fmt: String): Boolean =
    try { parsedatetime(s, fmt) != null } catch { case _: Exception => false }

  /** ISO week of year (zeta WEEK). */
  def week(ts: Timestamp): java.lang.Integer =
    if (ts == null) null
    else toLdt(ts).get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear())

  // ---- numeric / system ----

  /** NumericFunction truncate: toward-zero truncation at `digits` decimals. */
  def truncate(x: Double, digits: Int): Double = {
    val factor = math.pow(10, digits)
    if (x >= 0) math.floor(x * factor) / factor else math.ceil(x * factor) / factor
  }

  /** StringFunction.java:654 — TO_CHAR for numbers and datetimes. */
  def toCharTs(ts: Timestamp, fmt: String): String = formatdatetime(ts, fmt)
  def toCharNum(x: Double): String =
    if (x == math.rint(x) && !x.isInfinite) x.toLong.toString else x.toString

  // ---- arity/flag dispatch (doc-fidelity layer) ----
  //
  // Several documented zeta call forms can't be a single Scala UDF because
  // the same name needs multiple arities or literal-flag handling
  // (sql-functions.md: REGEXP_*(.., flagsString), TRUNC(numeric, digits),
  // DATEDIFF(a, b, unit), FROM_UNIXTIME(sec, fmt, tz)). These register as
  // function-registry BUILDERS that dispatch on argument shape and compose
  // Catalyst builtins, so 2-arg Spark forms keep their native codegen.

  /** H2 flag string -> inline regex modifiers; later flags override
    * earlier ones (sql-functions.md REGEXP_REPLACE notes).
    */
  private[functions] def flagsToInline(flags: String): String = {
    var ci = false; var dotall = false; var multi = false
    flags.foreach {
      case 'i' => ci = true
      case 'c' => ci = false
      case 'n' => dotall = true
      case 'm' => multi = true
      case ch => throw new IllegalArgumentException(s"invalid regexp flag '$ch'")
    }
    (if (ci) "(?i)" else "") + (if (dotall) "(?s)" else "") + (if (multi) "(?m)" else "")
  }

  private def registerBuilders(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.unsafe.types.UTF8String

    def call(name: String, args: Seq[Expression]): Expression =
      UnresolvedFunction(Seq(name), args, isDistinct = false)
    def litStr(e: Expression): Option[String] = e match {
      case Literal(null, _) => None
      case Literal(s: UTF8String, _) => Some(s.toString)
      case _ => None
    }
    def prefixed(pattern: Expression, flags: Expression): Expression = litStr(flags) match {
      case Some(f) if f.nonEmpty => Concat(Seq(Literal(flagsToInline(f)), pattern))
      case _ => pattern // NULL / empty flags = no modifiers
    }
    val reg = spark.sessionState.functionRegistry

    // REGEXP_REPLACE(s, re, rep[, flags]) — 4th arg is H2 flags, not
    // Spark's position
    reg.createOrReplaceTempFunction("regexp_replace", {
      case Seq(s, p, r) => RegExpReplace(s, p, r)
      case Seq(s, p, r, f) => RegExpReplace(s, prefixed(p, f), r)
      case args => throw new IllegalArgumentException(s"REGEXP_REPLACE: bad arg count ${args.length}")
    }, "built-in")

    // REGEXP_LIKE(s, re[, flags])
    reg.createOrReplaceTempFunction("regexp_like", {
      case Seq(s, p) => RLike(s, p)
      case Seq(s, p, f) => RLike(s, prefixed(p, f))
      case args => throw new IllegalArgumentException(s"REGEXP_LIKE: bad arg count ${args.length}")
    }, "built-in")

    // REGEXP_SUBSTR(s, re[, position, occurrence, flags, group]) — composed
    // from substring + regexp_extract_all + try_element_at (null on no match)
    reg.createOrReplaceTempFunction("regexp_substr", { args =>
      require(args.length >= 2, "REGEXP_SUBSTR needs at least 2 args")
      def isNullLit(e: Expression) = e match { case Literal(null, _) => true; case _ => false }
      val pat = prefixed(args(1), if (args.length >= 5) args(4) else Literal(null))
      val input = if (args.length >= 3 && !isNullLit(args(2)))
        call("substring", Seq(args.head, args(2), Literal(Int.MaxValue))) else args.head
      val occ = if (args.length >= 4 && !isNullLit(args(3))) args(3) else Literal(1)
      val grp = if (args.length >= 6 && !isNullLit(args(5))) args(5) else Literal(0)
      call("try_element_at", Seq(call("regexp_extract_all", Seq(input, pat, grp)), occ))
    }, "built-in")

    // TRUNC: numeric truncation (doc: TRUNC|TRUNCATE(numeric[, digits]));
    // string second arg keeps Spark's native date truncation
    reg.createOrReplaceTempFunction("trunc", {
      case Seq(d, fmt @ Literal(_: UTF8String, _)) => TruncDate(d, fmt)
      case Seq(x) => call("trunc_num", Seq(Cast(x, org.apache.spark.sql.types.DoubleType), Literal(0)))
      case Seq(x, digits) => call("trunc_num", Seq(Cast(x, org.apache.spark.sql.types.DoubleType), digits))
      case args => throw new IllegalArgumentException(s"TRUNC: bad arg count ${args.length}")
    }, "built-in")

    // H2/zeta CONCAT ignores NULL parameters (sql-functions.md: "NULL
    // parameters are ignored"; Spark's concat is null-propagating).
    // concat_ws('') has exactly those semantics for strings. The `||`
    // operator and DataFrame functions.concat are parsed structurally and
    // keep Spark behavior.
    reg.createOrReplaceTempFunction("concat", {
      args => call("concat_ws", Literal("") +: args)
    }, "built-in")

    // TIMESTAMPADD(ts, n, 'UNIT') — zeta order (the parser still handles
    // Spark's native TIMESTAMPADD(MONTH, n, ts) form before the registry)
    reg.createOrReplaceTempFunction("timestampadd", {
      case Seq(ts, n, unit @ Literal(_: UTF8String, _)) => call("dateadd", Seq(ts, n, unit))
      case args => throw new IllegalArgumentException(
        s"TIMESTAMPADD: expected (dateAndTime, addInt, 'unit'), got ${args.length} args")
    }, "built-in")

    // DATEDIFF(a, b, unit) = b - a per the reference (DateTimeFunction
    // .java:143); 2-arg form stays Spark's datediff(end, start)
    reg.createOrReplaceTempFunction("datediff", {
      case Seq(end, start) => DateDiff(end, start)
      case Seq(a, b, unit) => call("zeta_datediff", Seq(a, b, unit))
      case args => throw new IllegalArgumentException(s"DATEDIFF: bad arg count ${args.length}")
    }, "built-in")

    // FROM_UNIXTIME(sec[, fmt[, timeZone]]) — 3-arg zone form per the doc
    reg.createOrReplaceTempFunction("from_unixtime", {
      case Seq(sec) => FromUnixTime(sec, Literal("yyyy-MM-dd HH:mm:ss"))
      case Seq(sec, fmt) => FromUnixTime(sec, fmt)
      case Seq(sec, fmt, tz) =>
        val zone = litStr(tz).getOrElse(
          throw new IllegalArgumentException("FROM_UNIXTIME: timeZone must be a literal string"))
        FromUnixTime(sec, fmt).withTimeZone(zone).asInstanceOf[Expression]
      case args => throw new IllegalArgumentException(s"FROM_UNIXTIME: bad arg count ${args.length}")
    }, "built-in")
  }

  /** Register every zeta name Spark lacks on `spark`. Idempotent. */
  def register(spark: SparkSession): Unit = {
    registerBuilders(spark)
    val u = spark.udf
    u.register("hextoraw", hextoraw _)
    u.register("rawtohex", rawtohex _)
    // "INSERT" is a reserved statement keyword in Spark's parser; zeta SQL
    // using INSERT(...) should be rewritten to INSERT_STR(...).
    u.register("insert_str", insertStr _)
    u.register("dateadd", dateadd _)
    u.register("zeta_datediff", zetaDatediff _)
    u.register("dayname", dayname _)
    u.register("monthname", monthname _)
    u.register("formatdatetime", formatdatetime _)
    u.register("parsedatetime", parsedatetime _)
    u.register("is_date", isDate _)
    u.register("week", week _)
    u.register("day_of_month", (ts: Timestamp) => if (ts == null) null else Int.box(toLdt(ts).getDayOfMonth))
    u.register("day_of_year", (ts: Timestamp) => if (ts == null) null else Int.box(toLdt(ts).getDayOfYear))
    // H2 semantics: Sunday=1..Saturday=7 (matches Spark's dayofweek).
    u.register("day_of_week", (ts: Timestamp) => if (ts == null) null else Int.box(toLdt(ts).getDayOfWeek.getValue % 7 + 1))
    u.register("truncate", truncate _)
    u.register("trunc_num", truncate _)
    u.register("to_char", toCharTs _)
    u.register("to_char_num", toCharNum _)
    u.register("current_time",
      () => LocalTime.now().format(DateTimeFormatter.ofPattern("HH:mm:ss")))
    ()
  }
}
