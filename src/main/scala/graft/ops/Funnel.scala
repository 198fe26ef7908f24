package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for each entity, the earliest time it
  * completed stage k AFTER its stage-(k−1) completion — "view → click →
  * purchase, in that order" — the product-analytics query behind
  * conversion tracking, built from the same event streams a feature
  * store ingests (the reference has no funnel operator; its engine stops
  * at per-feature statistics).
  *
  * Semantics: `t₁ = min t of stage-1 events`; `tₖ = min t of stage-k
  * events with t ≥ tₖ₋₁` (same-instant completion allowed — a click
  * logged at the view's exact timestamp counts). An entity that never
  * reaches stage k has null `tₖ` and, by construction, null for every
  * later stage.
  *
  * Scale shape: one column-pruned pass per stage, each a
  * groupBy-on-entity joined to the previous stage's ≤|entities| frame —
  * every shuffle is on the SAME entity key, so Catalyst/AQE reuse the
  * exchange rather than re-partitioning per stage; stage count is small
  * and fixed. No windows, no data-sized state beyond the per-entity
  * frames.
  */
object Funnel {

  /** Per-entity stage completion times: `(entity, _t1.._tk)`, one row
    * per entity that completed at least stage 1.
    */
  def stageTimes(df: DataFrame, entityCol: String, stageCol: Column,
                 timeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val events = df.filter(col(entityCol).isNotNull &&
      col(timeCol).isNotNull)
    var acc = events.filter(stageCol === stages.head)
      .groupBy(col(entityCol))
      .agg(min(col(timeCol)).as("_t1"))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      val prev = s"_t$i"
      val cur = s"_t${i + 1}"
      val next = events.filter(stageCol === stage)
        .join(acc.select(col(entityCol), col(prev)), Seq(entityCol))
        .filter(col(timeCol) >= col(prev))
        .groupBy(col(entityCol))
        .agg(min(col(timeCol)).as(cur))
      acc = acc.join(next.select(col(entityCol), col(cur)),
        Seq(entityCol), "left")
    }
    acc
  }

  /** Funnel summary: entities reaching each stage + conversion from the
    * previous one (rounded at 6, the repo's float-oracle convention).
    */
  def summary(stageTimesDf: DataFrame, entityCol: String,
              nStages: Int): DataFrame = {
    val aggs = (1 to nStages).flatMap { i =>
      Seq(count(col(s"_t$i")).as(s"stage${i}_n")) ++
        (if (i > 1)
          Seq(round(count(col(s"_t$i")).cast("double") /
            count(col(s"_t${i - 1}")), 6).as(s"stage${i}_rate"))
        else Nil)
    }
    stageTimesDf.agg(aggs.head, aggs.tail: _*)
  }
}
