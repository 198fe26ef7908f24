package graft

import graft.catalog.TestTables
import graft.ir._
import graft.ir.Dsl._
import graft.planner.{QueryPlanner, QuerySql}
import org.apache.spark.sql.DataFrame

/** QuerySql must be a faithful second lowering of the IR: for every query
  * shape, `spark.sql(q.toSql)` ≡ `QueryPlanner.plan(spark, q)` — same
  * columns in the same order, same row multiset. The generated text is
  * also what the driver's DuckDB oracle executes verbatim (q66), so any
  * Spark-only syntax here would fail twice.
  */
class QuerySqlSpec extends SparkSpec {

  private def fg(t: String) = TestTables.fg(spark, sfDir, t)

  private def registerViews(): Unit =
    Seq("customer", "nation", "orders", "lineitem", "region").foreach { t =>
      spark.read.parquet(TestTables.parquet(sfDir, t))
        .createOrReplaceTempView(t)
    }

  /** Column-order + multiset equality via symmetric exceptAll. */
  private def assertSame(q: Query): Unit = {
    registerViews()
    val planned: DataFrame = QueryPlanner.plan(spark, q)
    val viaSql: DataFrame = spark.sql(QuerySql.toSql(q))
    assert(viaSql.columns.toSeq === planned.columns.toSeq,
      s"column mismatch for\n${QuerySql.toSql(q)}")
    assert(viaSql.exceptAll(planned).isEmpty && planned.exceptAll(viaSql).isEmpty,
      s"row mismatch for\n${QuerySql.toSql(q)}")
  }

  test("select + filter tree round-trips (all eight conditions)") {
    assertSame(Query.select(fg("orders"),
        Seq("o_orderkey", "o_totalprice", "o_orderstatus"))
      .where((("o_totalprice" >= 1000.0) && ("o_totalprice" <= 150000.0) &&
              ("o_orderstatus" =!= "X") && ("o_orderkey" > 10)) &&
             (("o_orderpriority" like "%URGENT%") ||
              ("o_orderstatus" in Seq("F", "O")) ||
              ("o_orderkey" === 1) || ("o_orderkey" < 5))))
  }

  test("asymmetric inner join with unselected left key + prefix") {
    assertSame(Query.select(fg("customer"), Seq("c_custkey", "c_name"))
      .join(Query.select(fg("nation"), Seq("n_name")),
        leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
        joinType = JoinType.Inner, prefix = Some("nat_")))
  }

  test("nested join renders as a subquery") {
    val inner = Query.select(fg("nation"), Seq("n_name"))
      .join(Query.select(fg("region"), Seq("r_name")),
        leftOn = Seq("n_regionkey"), rightOn = Seq("r_regionkey"),
        prefix = Some("reg_"))
    assertSame(Query.select(fg("customer"), Seq("c_custkey", "c_acctbal"))
      .join(inner, leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
        joinType = JoinType.Inner, prefix = Some("nat_")))
  }

  test("left semi and anti joins lower to EXISTS / NOT EXISTS") {
    val big = Query.select(fg("lineitem"), Seq("l_orderkey", "l_quantity"))
      .where("l_quantity" > 45.0)
    assertSame(Query.select(fg("orders"), Seq("o_orderkey", "o_totalprice"))
      .join(big, leftOn = Seq("o_orderkey"), rightOn = Seq("l_orderkey"),
        joinType = JoinType.LeftSemi))
    assertSame(Query.select(fg("orders"), Seq("o_orderkey"))
      .join(big, leftOn = Seq("o_orderkey"), rightOn = Seq("l_orderkey"),
        joinType = JoinType.LeftAnti))
  }

  test("full outer over symmetric keys uses USING (coalesced key)") {
    // two projections of orders keyed by the same column name
    val lo = Query.select(fg("orders"), Seq("o_orderkey", "o_totalprice"))
      .where("o_totalprice" > 100000.0)
    val hi = Query.select(fg("orders"), Seq("o_orderkey", "o_orderstatus"))
      .where("o_totalprice" <= 100000.0)
    assertSame(lo.join(hi, on = Seq("o_orderkey"), joinType = JoinType.Full,
      prefix = Some("late_")))
  }

  test("cross join and select-all") {
    assertSame(Query.selectAll(fg("region"))
      .join(Query.select(fg("nation"), Seq("n_name")),
        joinType = JoinType.Cross, prefix = Some("x_")))
  }

  test("selected asymmetric right key survives unprefixed") {
    assertSame(Query.select(fg("orders"), Seq("o_orderkey", "o_custkey"))
      .join(Query.select(fg("customer"), Seq("c_custkey", "c_name")),
        leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
        joinType = JoinType.Inner, prefix = Some("c_")))
  }

  test("filter over a prefixed joined column resolves to the right alias") {
    assertSame(Query.select(fg("customer"), Seq("c_custkey", "c_name"))
      .join(Query.select(fg("nation"), Seq("n_name")),
        leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
        joinType = JoinType.Inner, prefix = Some("nat_"))
      .where(("nat_n_name" like "A%") || ("c_custkey" < 100)))
  }

  test("time travel refuses SQL generation") {
    val q = Query.select(fg("orders"), Seq("o_orderkey")).asOf(1000L)
    intercept[QueryPlanner.PlanError](QuerySql.toSql(q))
  }

  test("ambiguous unprefixed join errors like the planner") {
    val q = Query.select(fg("orders"), Seq("o_orderkey", "o_custkey"))
      .join(Query.select(fg("orders"), Seq("o_orderkey", "o_totalprice")),
        leftOn = Seq("o_custkey"), rightOn = Seq("o_custkey"))
    intercept[QueryPlanner.PlanError](QuerySql.toSql(q))
  }
}
