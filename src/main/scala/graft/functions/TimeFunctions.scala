package graft.functions

import java.time._
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Event-time column of ANY accepted type → epoch MICROS (Long),
    * dispatched on the column's resolved Catalyst type so the same query
    * runs unchanged whether the parquet writer emitted int64 epochs or a
    * real timestamp column (the reference accepts the same spread of
    * event-time representations, engine/spark.py:762-847). Timestamps
    * convert exactly via `unix_micros` — NOT through the millis parser,
    * which would truncate sub-millisecond precision that the DuckDB
    * oracle's `epoch_us` keeps. Integral columns are unit-sniffed by
    * magnitude: epoch values in sec/ms/us/ns differ by ~3 orders of
    * magnitude each (2026 epoch ≈ 1.8e9 s / 1.8e12 ms / 1.8e15 us /
    * 1.8e18 ns), so the bands cannot collide for any date between 1973
    * and 5000. Integral division via the SQL `div` operator — double
    * division loses exactness above 2^53, misplacing nano-epoch events
    * near unit boundaries.
    */
  def eventTimeToMicros(df: org.apache.spark.sql.DataFrame,
                        colName: String): Column =
    eventTimeToMicros(col(colName), df.schema(colName).dataType)

  def eventTimeToMicros(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    // NTZ wall time is interpreted in the session timezone, which
    // SparkSessions pins to UTC — matching how DuckDB's epoch_us reads
    // the same naive-timestamp parquet
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case DateType => unix_date(c).cast(LongType) * 86400000000L
    case ByteType | ShortType | IntegerType | LongType =>
      val v = c.cast(LongType)
      when(v >= 100000000000000000L, call_function("div", v, lit(1000L)))
        .when(v >= 100000000000000L, v)          // already micros
        .when(v >= 100000000000L, v * 1000L)     // millis
        .otherwise(v * 1000000L)                 // seconds
    case StringType => eventTimeToMillis(c) * 1000L
    case other => throw new IllegalArgumentException(
      s"unsupported event-time column type: $other")
  }

  /** Event-time column of any accepted type → a proper TimestampType
    * column (for watermarks / windowed aggs / session windows, which
    * require a timestamp). Already-timestamp columns pass through
    * untouched — no round trip, no precision loss.
    */
  def eventTimeToTimestamp(df: org.apache.spark.sql.DataFrame,
                           colName: String): Column =
    df.schema(colName).dataType match {
      case TimestampType => col(colName)
      case TimestampNTZType => col(colName).cast(TimestampType)
      case dt => timestamp_micros(eventTimeToMicros(col(colName), dt))
    }

  /** epoch millis → Hudi-style commit string yyyyMMddHHmmssSSS
    * (reference util.get_hudi_datestr_from_timestamp).
    */
  def commitString(millis: Long): String =
    Instant.ofEpochMilli(millis).atZone(ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS"))
}
