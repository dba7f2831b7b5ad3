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

  /** Register every zeta name Spark lacks on `spark`. Idempotent. */
  def register(spark: SparkSession): Unit = {
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
