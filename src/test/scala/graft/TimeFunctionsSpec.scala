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
}
