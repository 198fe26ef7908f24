package graft

import graft.catalog.TestTables
import graft.ir._
import graft.ir.Dsl._
import graft.model.FeatureGroup
import graft.planner.QueryPlanner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry exercises one operator of the SURVEY §2 inventory
  * through the engine's public surface (IR → planner → DataFrame);
  * `oracleSql` holds the DuckDB-equivalent SQL for the driver's compare.
  */
object SparkEntry {

  private def fg(spark: SparkSession, dir: String, table: String): FeatureGroup =
    TestTables.fg(spark, dir, table)

  private def q(spark: SparkSession, query: Query): DataFrame =
    QueryPlanner.plan(spark, query)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pricing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5 aggregation surface: one-pass grouped profile over lineitem.
    "q01_agg_pricing" -> ((s, dir) => {
      val li = s.read.parquet(TestTables.parquet(dir, "lineitem"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.3 projection + filter through the IR.
    "q02_select_filter" -> ((s, dir) => {
      val c = fg(s, dir, "customer")
      q(s, Query.select(c, Seq("c_custkey", "c_name", "c_acctbal"))
        .where(("c_acctbal" > 5000.0) && ("c_mktsegment" in Seq("BUILDING", "AUTOMOBILE"))))
        .orderBy("c_custkey")
    }),

    // §2.3 all eight filter conditions in one boolean tree.
    "q03_filter_tree" -> ((s, dir) => {
      val o = fg(s, dir, "orders")
      q(s, Query.select(o, Seq("o_orderkey", "o_totalprice", "o_orderstatus",
          "o_orderpriority"))
        .where((("o_totalprice" >= 1000.0) && ("o_totalprice" <= 150000.0) &&
                ("o_orderstatus" =!= "X") && ("o_orderkey" > 10) &&
                ("o_orderkey" < 100000000)) &&
               (("o_orderpriority" like "%URGENT%") ||
                ("o_orderstatus" in Seq("F", "O")) ||
                ("o_orderkey" === 1))))
        .orderBy("o_orderkey")
    }),

    // §2.4 inner equi-join, asymmetric keys, via the IR.
    "q04_join_inner" -> ((s, dir) => {
            q(s, Query.select(fg(s, dir, "orders"), Seq("o_orderkey", "o_custkey", "o_totalprice"))
        .join(Query.select(fg(s, dir, "customer"), Seq("c_name", "c_mktsegment")),
          leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
          joinType = JoinType.Inner)
        .where("o_totalprice" > 200000.0))
        .orderBy("o_orderkey")
    }),

    // §2.4 left join + per-join column prefix disambiguation.
    "q05_join_left_prefix" -> ((s, dir) => {
            q(s, Query.select(fg(s, dir, "customer"), Seq("c_custkey", "c_name"))
        .join(Query.select(fg(s, dir, "nation"), Seq("n_name")),
          leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
          joinType = JoinType.Left, prefix = Some("nat_")))
        .orderBy("c_custkey")
    }),

    // §2.4 left-semi join (EXISTS).
    "q06_join_semi" -> ((s, dir) => {
            q(s, Query.select(fg(s, dir, "orders"), Seq("o_orderkey", "o_totalprice"))
        .join(Query.select(fg(s, dir, "lineitem"), Seq())
            .where("l_quantity" > 45.0),
          leftOn = Seq("o_orderkey"), rightOn = Seq("l_orderkey"),
          joinType = JoinType.LeftSemi))
        .orderBy("o_orderkey")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_select_filter" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE c_acctbal > 5000.0 AND c_mktsegment IN ('BUILDING','AUTOMOBILE')
         ORDER BY c_custkey""",
    "q03_filter_tree" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
         FROM orders
         WHERE (o_totalprice >= 1000.0 AND o_totalprice <= 150000.0
                AND o_orderstatus <> 'X' AND o_orderkey > 10
                AND o_orderkey < 100000000)
           AND (o_orderpriority LIKE '%URGENT%'
                OR o_orderstatus IN ('F','O') OR o_orderkey = 1)
         ORDER BY o_orderkey""",
    "q04_join_inner" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice > 200000.0
         ORDER BY o_orderkey""",
    "q05_join_left_prefix" ->
      """SELECT c_custkey, c_name, n_name AS nat_n_name
         FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_custkey""",
    "q06_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
         ORDER BY o_orderkey"""
  )
}
