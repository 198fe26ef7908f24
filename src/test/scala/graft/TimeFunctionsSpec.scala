package graft

import graft.functions.TimeFunctions._
import org.apache.spark.sql.functions.col

class TimeFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("driver-side event-time normalization accepts every reference form") {
    assert(toEpochMillis("2024") === 1704067200000L)
    assert(toEpochMillis("202401") === 1704067200000L)
    assert(toEpochMillis("20240101") === 1704067200000L)
    assert(toEpochMillis("2024010112") === 1704110400000L)
    assert(toEpochMillis("202401011230") === 1704112200000L)
    assert(toEpochMillis("20240101123045") === 1704112245000L)
    assert(toEpochMillis("2024-01-01") === 1704067200000L)
    assert(toEpochMillis("2024-01-01 12:30:45") === 1704112245000L)
    assert(toEpochMillis(1704067200) === 1704067200000L)      // epoch seconds
    assert(toEpochMillis(1704067200000L) === 1704067200000L)  // epoch millis
    assert(toEpochMillis(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      === 1704067200000L)
    intercept[IllegalArgumentException] { toEpochMillis("not a time") }
  }

  test("column-side normalization matches the driver-side parser") {
    val inputs = Seq("20240101", "2024010112", "20240101123045",
      "2024-01-01", "2024-01-01 12:30:45", "1704067200", "1704067200000")
    val df = inputs.toDF("s").withColumn("ms", eventTimeToMillis(col("s")))
    val got = df.collect().map(r => r.getAs[String]("s") -> r.getAs[Long]("ms")).toMap
    inputs.foreach { in =>
      assert(got(in) === toEpochMillis(in), s"for input $in")
    }
  }

  test("commit string round trip") {
    assert(commitString(1704067200000L) === "20240101000000000")
  }

  test("eventTimeToMicros dispatches on the column's actual type") {
    import org.apache.spark.sql.functions._
    val base = 1704112245123456L // 2024-01-01 12:30:45.123456 UTC, micros
    // integral unit sniffing: sec / ms / us / ns bands
    val longs = Seq(
      ("sec", base / 1000000L, base / 1000000L * 1000000L),
      ("ms", base / 1000L, base / 1000L * 1000L),
      ("us", base, base),
      ("ns", base * 1000L, base)).toDF("unit", "v", "want")
    val gotLongs = longs
      .withColumn("got", eventTimeToMicros(col("v"),
        org.apache.spark.sql.types.LongType))
      .collect()
    gotLongs.foreach { r =>
      assert(r.getAs[Long]("got") === r.getAs[Long]("want"),
        s"for unit ${r.getAs[String]("unit")}")
    }
    // timestamp and timestamp_ntz columns → exact micros under the
    // pinned-UTC session, sub-millisecond precision preserved
    val tsDf = Seq(1).toDF("i")
      .withColumn("ts", timestamp_micros(lit(base)))
      .withColumn("ntz", col("ts").cast("timestamp_ntz"))
    assert(tsDf.select(eventTimeToMicros(tsDf, "ts")).head.getLong(0) === base)
    assert(tsDf.select(eventTimeToMicros(tsDf, "ntz")).head.getLong(0) === base)
    // string columns route through the millis parser (ms resolution)
    val strDf = Seq("2024-01-01 12:30:45").toDF("s")
    assert(strDf.select(eventTimeToMicros(strDf, "s")).head.getLong(0)
      === 1704112245000000L)
  }

  test("eventTimeToTimestamp yields a usable TimestampType for any input") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.TimestampType
    val base = 1704112245123456L
    val df = Seq(1).toDF("i")
      .withColumn("ts", timestamp_micros(lit(base)))
      .withColumn("ntz", col("ts").cast("timestamp_ntz"))
      .withColumn("ns", lit(base * 1000L))
    Seq("ts", "ntz", "ns").foreach { c =>
      val out = df.select(eventTimeToTimestamp(df, c).as("t"))
      assert(out.schema("t").dataType === TimestampType, s"for column $c")
      assert(out.select(unix_micros(col("t"))).head.getLong(0) === base,
        s"for column $c")
    }
  }
}
