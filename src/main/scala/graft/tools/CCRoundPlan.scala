package graft.tools

/** Prints the physical plan of ONE alternating-star CC round (the body
  * q63/q57/q61/q81/q84/q197's duplicateClusters loop repeats) with AQE
  * off, plus its ShuffleExchange count — the per-round plan evidence the
  * checkpointed full-query explain cannot show (each round's lineage is
  * pinned away). `sbt "runMain graft.tools.CCRoundPlan"`.
  */
object CCRoundPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSessions.local("8", "graft-cc-round-plan")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("u", "v")
    // the fused round duplicateClusters actually loops (r14):
    // oriented small-star directly over large-star's u-keyed output
    val round = graft.ops.Dedup.ccSmallStarOriented(
      graft.ops.Dedup.ccLargeStar(edges))
    val p = round.queryExecution.executedPlan
    val n = p.collect {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => ()
    }.size
    println(s"CC_ROUND_SHUFFLES $n")
    round.explain("formatted")
    spark.stop()
  }
}
