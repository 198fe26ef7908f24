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

  test("property: random IR shapes — generated SQL ≡ planner") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def forSamples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
      (0 until n).foreach { i =>
        gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
      }
    val cust = fg("customer"); val nat = fg("nation")
    val reg = fg("region"); val ord = fg("orders")
    val joinTypeGen =
      Gen.oneOf(JoinType.Inner, JoinType.Left, JoinType.LeftSemi,
        JoinType.LeftAnti)

    val natQ: Gen[Query] = Gen.oneOf(true, false).map { withReg =>
      val base = Query.select(nat, Seq("n_name"))
      if (withReg) base.join(Query.select(reg, Seq("r_name")),
        leftOn = Seq("n_regionkey"), rightOn = Seq("r_regionkey"),
        prefix = Some("reg_"))
      else base
    }
    val custQ: Gen[Query] = for {
      nq <- natQ
      jt <- joinTypeGen
      withNation <- Gen.oneOf(true, false)
      thr <- Gen.option(Gen.choose(0.0, 9000.0))
    } yield {
      val base = Query.select(cust, Seq("c_custkey", "c_name"))
      val joined =
        if (withNation) base.join(nq, leftOn = Seq("c_nationkey"),
          rightOn = Seq("n_nationkey"), joinType = jt, prefix = Some("nat_"))
        else base
      thr.map(t => joined.where("c_acctbal" > t)).getOrElse(joined)
    }
    val ordQ: Gen[Query] = for {
      cq <- custQ
      jt <- joinTypeGen
      thr <- Gen.choose(0.0, 300000.0)
      useFilter <- Gen.oneOf(true, false)
    } yield {
      val joined = Query.select(ord, Seq("o_orderkey", "o_totalprice"))
        .join(cq, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
          joinType = jt)
      if (useFilter)
        joined.where(("o_totalprice" > thr) ||
          ("o_orderkey" in Seq(1L, 2L, 3L)))
      else joined
    }
    forSamples(Gen.oneOf(custQ, ordQ), 12)(assertSame)
  }

  test("EXISTS correlation is immune to column capture after USING join") {
    // the semi subquery exposes a column with the SAME name as the
    // USING-merged (unqualified) outer key while correlating on a
    // different column — without key mangling the inner o_orderkey
    // captures the outer reference
    val lo = Query.select(fg("orders"), Seq("o_orderkey", "o_totalprice"))
    val hi = Query.select(fg("orders"), Seq("o_orderkey", "o_orderstatus"))
    val probe = Query.select(fg("orders"), Seq("o_orderkey", "o_custkey"))
      .where("o_totalprice" > 50000.0)
    assertSame(lo.join(hi, on = Seq("o_orderkey"),
        joinType = JoinType.Inner, prefix = Some("b_"))
      .join(probe, leftOn = Seq("o_orderkey"), rightOn = Seq("o_custkey"),
        joinType = JoinType.LeftSemi))
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

  test("backslash string literal refuses SQL generation (non-portable)") {
    // Spark parses \ as an escape character, DuckDB and lit() take it
    // literally — one text cannot mean the same thing to both engines
    val q = Query.select(fg("orders"), Seq("o_orderkey"))
      .where("o_orderpriority" === "a\\b")
    intercept[QueryPlanner.PlanError](QuerySql.toSql(q))
    val likeQ = Query.select(fg("orders"), Seq("o_orderkey"))
      .where("o_orderpriority" like "%\\_%")
    intercept[QueryPlanner.PlanError](QuerySql.toSql(likeQ))
  }

  test("select-all refuses generation when declared features went stale") {
    import graft.model._
    import org.apache.spark.sql.types._
    import spark.implicits._
    // the bound frame grew an extra column (schema evolution) that the
    // declaration doesn't know about: plan() would return 3 columns, the
    // generated SQL 2 — refuse instead of diverging silently
    val df = Seq((1L, "x", 2.0)).toDF("k", "v", "appended")
    val stale = FeatureGroup("stale_fg",
      features = Seq(Feature("k", LongType), Feature("v", StringType)),
      primaryKey = Seq("k"), source = DataFrameSource(df))
    intercept[QueryPlanner.PlanError](QuerySql.toSql(Query.selectAll(stale)))
    // an explicit projection over the same group still generates
    QuerySql.toSql(Query.select(stale, Seq("k", "v")))
    // and a declaration matching the frame generates under select-all
    val fresh = stale.copy(features = stale.features :+
      Feature("appended", DoubleType))
    QuerySql.toSql(Query.selectAll(fresh))
  }
}
