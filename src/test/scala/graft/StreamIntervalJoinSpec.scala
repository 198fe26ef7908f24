package graft

import graft.streaming.Streaming
import org.apache.spark.sql.functions._

class StreamIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("stream-stream interval join equals the batch range join") {
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val stream0 = Streaming.readStream(spark, "parquet",
      Some("/root/testdata/sf0.001/events.*"), schema = Some(batch.schema))
    def ts2(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts2",
        graft.functions.TimeFunctions.eventTimeToTimestamp(df, "ts"))
    val s = ts2(stream0)
    val clicks = s.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts2".as("click_ts"))
    val views = s.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id".as("v_user_id"),
        $"ts2".as("view_ts"))
    val streamed = Streaming.runToMemory(
      Streaming.intervalJoin(clicks, "click_ts", "1 day",
          views, "view_ts", "1 day",
          Seq("user_id"), Seq("v_user_id"), lookback = "1 HOUR")
        .select($"click_id", $"view_id"),
      "ssij_", "append")

    val b = ts2(batch)
    val bc = b.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts2".as("click_ts"))
    val bv = b.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id".as("v_user_id"),
        $"ts2".as("view_ts"))
    val expected = bc.join(bv,
      $"user_id" === $"v_user_id" &&
        $"view_ts" >= $"click_ts" - expr("INTERVAL 1 HOUR") &&
        $"view_ts" <= $"click_ts")
      .select($"click_id", $"view_id")

    assert(streamed.count() > 0, "join produced no rows")
    assert(streamed.except(expected).isEmpty &&
      expected.except(streamed).isEmpty)
  }

  test("both sides carry watermarks (state is expirable)") {
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val s0 = Streaming.readStream(spark, "parquet",
      Some("/root/testdata/sf0.001/events.*"), schema = Some(batch.schema))
    val s = s0.withColumn("ts2",
      graft.functions.TimeFunctions.eventTimeToTimestamp(s0, "ts"))
    val l = s.select($"event_id".as("a_id"), $"user_id", $"ts2".as("a_ts"))
    val r = s.select($"event_id".as("b_id"), $"user_id".as("u2"),
      $"ts2".as("b_ts"))
    val j = Streaming.intervalJoin(l, "a_ts", "10 minutes",
      r, "b_ts", "10 minutes", Seq("user_id"), Seq("u2"), "30 MINUTES")
    val plan = j.queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"), plan)
    assert(plan.split("EventTimeWatermark").length - 1 === 2,
      "each side needs its own watermark")
  }
}
