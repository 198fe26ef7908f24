package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Materialize.PinOps

/** Market-basket association rules — item co-occurrence with support /
  * confidence / lift, the classic recommender-bootstrap and
  * "users who did X also did Y" analytics op. Beyond the reference's
  * own surface; part of the large-scale pipeline brief next to the
  * negative-sampling and retrieval operators.
  *
  * Scale shape: ONE distinct collapse to (basket, item) membership
  * (the only data-sized shuffle, map-side combined), then the pair
  * frame is a within-basket self-join whose volume is Σ|basket|² over
  * DISTINCT items per basket — bounded by the catalog breadth a basket
  * can touch, not by raw event volume (a user with 10⁶ repeat clicks
  * on one item contributes one membership row). For hub-heavy catalogs
  * `maxBasketItems` caps the fan-out loudly instead of letting one
  * mega-basket quadratically dominate a task.
  */
object Associations {

  /** Pairwise rules over (basket, item) memberships derived from
    * `df`. Every count is an exact integer; support / confidence /
    * lift are single final divisions — fully replayable by an
    * external SQL oracle.
    *
    * Output per unordered pair (item_a < item_b): n_a, n_b (baskets
    * containing each), n_ab (both), support = n_ab/N,
    * conf_a_to_b = n_ab/n_a, conf_b_to_a = n_ab/n_b,
    * lift = n_ab·N/(n_a·n_b).
    */
  def pairRules(df: DataFrame, basketCol: Column, itemCol: Column,
                minPairCount: Long = 1L,
                maxBasketItems: Int = 10000): DataFrame = {
    // pinned (Materialize policy; default localCheckpoint, not cache):
    // one eager materialization whose
    // blocks free on GC, instead of CacheManager entries that pile up
    // across invocations in a long-lived session
    val memb = df.select(basketCol.as("_bk"),
        itemCol.cast("string").as("_it"))
      .filter(col("_bk").isNotNull && col("_it").isNotNull)
      .distinct()
      .pinned()
    // ONE driver action serves both the loud skew guard and |baskets|:
    // the per-basket breadth frame's row count IS the basket count
    val stats = memb.groupBy("_bk").agg(count(lit(1)).as("_w"))
      .agg(max(col("_w")).as("_max"), count(lit(1)).as("_n"))
      .collect().head
    require(stats.isNullAt(0) || stats.getLong(0) <= maxBasketItems,
      s"a basket touches more than $maxBasketItems distinct items — " +
        "pre-prune hub items or raise maxBasketItems (pair volume is " +
        "quadratic in basket breadth)")
    val nBaskets = stats.getLong(1)
    val itemN = memb.groupBy(col("_it")).agg(count(lit(1)).as("_ni"))
    val l = memb.select(col("_bk"), col("_it").as("item_a"))
    val r = memb.select(col("_bk"), col("_it").as("item_b"))
    val pairs = l.join(r, Seq("_bk"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(broadcast(itemN.withColumnRenamed("_it", "item_a")
        .withColumnRenamed("_ni", "n_a")), Seq("item_a"))
      .join(broadcast(itemN.withColumnRenamed("_it", "item_b")
        .withColumnRenamed("_ni", "n_b")), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        round(col("n_ab") / lit(nBaskets.toDouble), 6).as("support"),
        round(col("n_ab") / col("n_a").cast("double"), 6)
          .as("conf_a_to_b"),
        round(col("n_ab") / col("n_b").cast("double"), 6)
          .as("conf_b_to_a"),
        round(col("n_ab").cast("double") * nBaskets /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }

  /** Sequential pattern support — "entities that did A and then B
    * within `windowBuckets` periods": the ORDERED complement of
    * [[pairRules]]' unordered co-occurrence, the input to next-action
    * models and funnel mining.
    *
    * An entity supports (A → B) iff it has A active in some bucket d
    * and B active in (d, d + windowBuckets]. Repeat activity collapses
    * first (distinct (entity, item, bucket) memberships — the only
    * data-sized shuffle), the candidate join runs per entity over the
    * collapsed frame (volume Σ per-entity |memberships|², bounded by
    * catalog × window, not raw events), and the pattern de-dups per
    * entity before counting, so support counts ENTITIES — all exact
    * integers plus one share division.
    *
    * Output per (antecedent, consequent): n_entities,
    * support = n_entities / |entities with any membership|.
    * Self-patterns (A → A) count only true repeats in later buckets.
    */
  def sequencePatterns(df: DataFrame, entityCol: Column, itemCol: Column,
                       bucketCol: Column, windowBuckets: Int): DataFrame = {
    require(windowBuckets >= 1, "windowBuckets must be at least 1")
    val memb = df.select(entityCol.as("_e"),
        itemCol.cast("string").as("_it"), bucketCol.cast("long").as("_b"))
      .filter(col("_e").isNotNull && col("_it").isNotNull &&
        col("_b").isNotNull)
      .distinct()
      .pinned()
    val nEntities = memb.select(col("_e")).distinct().count()
    val a = memb.select(col("_e"), col("_it").as("antecedent"),
      col("_b").as("_ba"))
    val b = memb.select(col("_e"), col("_it").as("consequent"),
      col("_b").as("_bb"))
    val patterns = a.join(b, Seq("_e"))
      .filter(col("_bb") > col("_ba") &&
        col("_bb") <= col("_ba") + windowBuckets)
      .select(col("_e"), col("antecedent"), col("consequent"))
      .distinct()
    patterns.groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_entities"))
      .select(col("antecedent"), col("consequent"), col("n_entities"),
        round(col("n_entities") / lit(nEntities.toDouble), 6)
          .as("support"))
  }
}
