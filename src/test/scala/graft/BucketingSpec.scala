package graft

import graft.sources.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(o, "b_orders", Seq("o_orderkey"), 8,
      sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketed(li, "b_lineitem", Seq("o_orderkey"), 8,
      sortCols = Seq("o_orderkey"))

    // rule out broadcast so the no-shuffle property is attributable to the
    // bucket layout, not to a BroadcastHashJoin
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cozyJoin(spark, "b_orders", "b_lineitem",
        Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(plan.toString.contains("SortMergeJoin"))
      assert(shuffles.isEmpty,
        s"expected a shuffle-free bucketed join, got:\n$plan")

      // and it is still correct
      val expected = o.join(li, Seq("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
