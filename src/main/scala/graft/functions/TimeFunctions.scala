package graft.functions

import java.time._
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event-time normalization: every accepted representation → epoch millis
  * (UTC). Mirrors the reference's format-sniffing parser
  * (python/hsfs/engine/spark.py:762-847, util.convert_event_time_to_timestamp):
  * accepted inputs are strings in `%Y%m%d[%H[%M[%S[%f]]]]` or ISO forms,
  * ints in seconds-or-millis epoch, dates, timestamps.
  */
object TimeFunctions {

  private val patterns: Seq[(Int, DateTimeFormatter)] = Seq(
    4  -> DateTimeFormatter.ofPattern("yyyy"),
    6  -> DateTimeFormatter.ofPattern("yyyyMM"),
    8  -> DateTimeFormatter.ofPattern("yyyyMMdd"),
    10 -> DateTimeFormatter.ofPattern("yyyyMMddHH"),
    12 -> DateTimeFormatter.ofPattern("yyyyMMddHHmm"),
    14 -> DateTimeFormatter.ofPattern("yyyyMMddHHmmss"),
    17 -> DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
  )

  /** Driver-side scalar conversion of any accepted event-time value. */
  def toEpochMillis(v: Any): Long = v match {
    case l: Long                => if (l < 100000000000L && l > 10000000L) l * 1000L else l
    case i: Int                 => i.toLong * 1000L
    case t: java.sql.Timestamp  => t.getTime
    case d: java.sql.Date       => d.getTime
    case d: LocalDate           => d.atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    case d: LocalDateTime       => d.toInstant(ZoneOffset.UTC).toEpochMilli
    case i: Instant             => i.toEpochMilli
    case s: String              => parseString(s)
    case other =>
      throw new IllegalArgumentException(s"unsupported event-time value: $other")
  }

  private def parseString(s: String): Long = {
    val t = s.trim
    if (t.forall(_.isDigit)) {
      val byPattern = patterns.find(_._1 == t.length).flatMap { case (n, fmt) =>
        try {
          val ldt = n match {
            case 4 => Year.parse(t, fmt).atDay(1).atStartOfDay()
            case 6 => YearMonth.parse(t, fmt).atDay(1).atStartOfDay()
            case 8 => LocalDate.parse(t, fmt).atStartOfDay()
            case _ => LocalDateTime.parse(t, fmt)
          }
          Some(ldt.toInstant(ZoneOffset.UTC).toEpochMilli)
        } catch { case _: Exception => None } // e.g. "1704067200" isn't yyyyMMddHH
      }
      byPattern.getOrElse(toEpochMillis(t.toLong)) // bare epoch digits
    } else {
      val iso = Seq(
        "yyyy-MM-dd HH:mm:ss.SSS", "yyyy-MM-dd'T'HH:mm:ss.SSS",
        "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss",
        "yyyy-MM-dd HH:mm", "yyyy-MM-dd")
      iso.iterator.flatMap { p =>
        try {
          val fmt = DateTimeFormatter.ofPattern(p)
          val ldt =
            if (p == "yyyy-MM-dd") LocalDate.parse(t, fmt).atStartOfDay()
            else LocalDateTime.parse(t, fmt)
          Iterator.single(ldt.toInstant(ZoneOffset.UTC).toEpochMilli)
        } catch { case _: Exception => Iterator.empty }
      }.nextOption().getOrElse(
        throw new IllegalArgumentException(s"unparseable event time: $s"))
    }
  }

  /** Column-side normalization of an event-time column of any accepted type
    * to epoch millis. String columns are format-sniffed per row with native
    * expressions (no UDF — stays inside codegen), unlike the reference's
    * python UDF (engine/spark.py:762-852).
    */
  def eventTimeToMillis(c: Column): Column = {
    val s = c.cast("string")
    val digits = s.rlike("^[0-9]+$")
    val parsed =
      when(length(s) === 4,  unix_millis(try_to_timestamp(s, lit("yyyy"))))
        .when(length(s) === 6,  unix_millis(try_to_timestamp(s, lit("yyyyMM"))))
        .when(length(s) === 8,  unix_millis(try_to_timestamp(s, lit("yyyyMMdd"))))
        .when(length(s) === 10, unix_millis(try_to_timestamp(s, lit("yyyyMMddHH"))))
        .when(length(s) === 12, unix_millis(try_to_timestamp(s, lit("yyyyMMddHHmm"))))
        .when(length(s) === 14, unix_millis(try_to_timestamp(s, lit("yyyyMMddHHmmss"))))
        .when(length(s) === 17, unix_millis(try_to_timestamp(s, lit("yyyyMMddHHmmssSSS"))))
    // bare epoch fallback (also for digit strings that fail their pattern,
    // e.g. 10-digit epoch seconds): seconds if 1e8 < v < 1e11 else millis
    // (reference heuristic, engine/spark.py:821-833)
    val epochFallback =
      when(s.cast("long").between(100000000L, 100000000000L),
        s.cast("long") * 1000L).otherwise(s.cast("long"))
    val fromDigits = coalesce(parsed, epochFallback)
    val fromIso = unix_millis(coalesce(
      try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss.SSS")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
      try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(s, lit("yyyy-MM-dd HH:mm")),
      try_to_timestamp(s, lit("yyyy-MM-dd")),
      try_to_timestamp(s)))
    when(digits, fromDigits).otherwise(fromIso)
  }

  /** epoch millis → Hudi-style commit string yyyyMMddHHmmssSSS
    * (reference util.get_hudi_datestr_from_timestamp).
    */
  def commitString(millis: Long): String =
    Instant.ofEpochMilli(millis).atZone(ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS"))
}
