package graft

import graft.catalog.TestTables
import graft.ir._
import graft.ir.Dsl._
import graft.planner.QueryPlanner

class PlannerSpec extends SparkSpec {

  private def fg(t: String) = TestTables.fg(spark, sfDir, t)

  test("select-all excludes primary key / event time on request") {
    val q = Query.selectAll(fg("orders"), includePrimaryKey = false,
      includeEventTime = false)
    val cols = QueryPlanner.plan(spark, q).columns.toSeq
    assert(!cols.contains("o_orderkey") && !cols.contains("o_orderdate"))
    assert(cols.contains("o_totalprice"))
  }

  test("feature-group query sugar matches the reference API shape") {
    val q = fg("customer").select("c_custkey", "c_name")
      .join(fg("nation").selectAll(),
        leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
        joinType = JoinType.Inner, prefix = Some("n_"))
    val cols = QueryPlanner.plan(spark, q).columns
    assert(cols.take(2).toSeq === Seq("c_custkey", "c_name"))
    assert(cols.contains("n_n_name"))
  }

  test("select_except drops the named features") {
    val q = Query.selectExcept(fg("customer"), Seq("c_acctbal", "c_mktsegment"))
    assert(QueryPlanner.plan(spark, q).columns.toSeq ===
      Seq("c_custkey", "c_name", "c_nationkey"))
  }

  test("append_feature extends the projection") {
    val q = Query.select(fg("customer"), Seq("c_custkey")).appendFeature("c_name")
    assert(QueryPlanner.plan(spark, q).columns.toSeq === Seq("c_custkey", "c_name"))
  }

  test("unresolvable column raises a plan error") {
    val q = Query.select(fg("customer"), Seq("no_such_col"))
    intercept[QueryPlanner.PlanError] { QueryPlanner.plan(spark, q) }
  }

  test("join-key inference fails clearly when PKs don't intersect") {
    val q = Query.selectAll(fg("customer")).join(Query.selectAll(fg("nation")))
    val e = intercept[QueryPlanner.PlanError] { QueryPlanner.plan(spark, q) }
    assert(e.getMessage.contains("could not infer join keys"))
  }

  test("ambiguous duplicate output columns raise unless prefixed") {
    val q = Query.select(fg("customer"), Seq("c_custkey", "c_name"))
      .join(Query.select(fg("customer"), Seq("c_name")),
        on = Seq("c_custkey"), joinType = JoinType.Inner)
    val e = intercept[QueryPlanner.PlanError] { QueryPlanner.plan(spark, q) }
    assert(e.getMessage.contains("ambiguous"))

    val ok = Query.select(fg("customer"), Seq("c_custkey", "c_name"))
      .join(Query.select(fg("customer"), Seq("c_name")),
        on = Seq("c_custkey"), joinType = JoinType.Inner,
        prefix = Some("r_"))
    val cols = QueryPlanner.plan(spark, ok).columns.toSeq
    assert(cols === Seq("c_custkey", "c_name", "r_c_name"))
  }

  test("inferred-key join tolerates the right side selecting its key") {
    val spineDf = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderdate")
    val spineFg = graft.model.FeatureGroup.spine("okspine", spineDf,
      primaryKey = Seq("o_orderkey"))
    // right selects its own (shared-name) key — the duplicate must collapse
    val q = Query.selectAll(spineFg)
      .join(Query.select(fg("orders"), Seq("o_orderkey", "o_totalprice")),
        joinType = JoinType.Inner)
    val df = QueryPlanner.plan(spark, q)
    assert(df.columns.count(_ == "o_orderkey") === 1)
    assert(df.count() === spineDf.count())
  }

  test("filter tree compiles: nested and/or with all condition kinds") {
    val q = Query.select(fg("orders"), Seq("o_orderkey"))
      .where((("o_totalprice" > 0.0) && ("o_orderstatus" =!= "nope")) ||
             (("o_orderpriority" like "%never%") && ("o_orderkey" in Seq(1, 2))))
    assert(QueryPlanner.plan(spark, q).count() > 0)
  }

  test("anti join returns left rows without matches") {
    // customers with no order above 300k (every customer has some order)
    val q = Query.select(fg("customer"), Seq("c_custkey"))
      .join(Query.select(fg("orders"), Seq())
          .where("o_totalprice" > 300000.0),
        leftOn = Seq("c_custkey"), rightOn = Seq("o_custkey"),
        joinType = JoinType.LeftAnti)
    val n = QueryPlanner.plan(spark, q).count()
    val total = QueryPlanner.plan(spark,
      Query.select(fg("customer"), Seq("c_custkey"))).count()
    assert(n > 0 && n < total)
  }
}
