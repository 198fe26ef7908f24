package graft

import graft.functions.TextNormalize
import graft.ops.{GraphOps, Statistics}
import org.apache.spark.sql.functions._

/** Round-11 operators: Markov transitions, PageRank, mutual
  * information, isotonic regression (minimax form), and unicode
  * canonicalization — each against hand-computed closed-form values.
  */
class GraphStatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("transitionCounts: lead pairing, counts, row-conditional p") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"))
      .toDF("u", "t", "s")
    val out = GraphOps.transitionCounts(df, "u", Seq(col("t")), col("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // user 1: a→b, b→a, a→c; user 2: a→b  ⇒ from a: {b:2, c:1}
    assert(out(("a", "b")) == (2L, 0.666667))
    assert(out(("a", "c")) == (1L, 0.333333))
    assert(out(("b", "a")) == (1L, 1.0))
    assert(out.size == 3)
  }

  test("pageRank: hand-computed 2-iteration ranks on a 3-node chain " +
    "with a sink") {
    // a→b, a→b (parallel ⇒ weight 2), b→c; c is a sink
    // (nodes a=1, b=2, c=3)
    val e = Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("s", "d")
    val out = GraphOps.pageRank(e, "s", "d", iterations = 2,
        damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // r0 = 1 everywhere. shares: a→b 1.0, b→c 1.0.
    // iter1: a = 0.15; b = 0.15 + 0.85·1 = 1.0; c = 0.15 + 0.85·1 = 1.0
    // iter2: a = 0.15; b = 0.15 + 0.85·0.15 = 0.2775; c = 0.15 + 0.85·1.0
    val base = 1.0 - 0.85
    assert(math.abs(out(1L) - base) < 1e-9)
    assert(math.abs(out(2L) - (base + 0.85 * base)) < 1e-9)
    assert(math.abs(out(3L) - (base + 0.85 * 1.0)) < 1e-9)
  }

  test("mutualInformation: zero for an independent feature, H(Y) for a " +
    "determining one, and null is a real cell") {
    val df = (0 until 64).map { i =>
      val y = i % 2 // label
      val dep = if (y == 0) "p" else "q"      // fully determines y
      val ind = if (i % 4 < 2) "u" else "v"   // independent of y
      (dep, ind, y)
    }.toDF("dep", "ind", "y")
    val out = Statistics.mutualInformation(df,
        Seq("dep" -> col("dep"), "ind" -> col("ind")), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("ind") == 0.0, "independent feature ⇒ I = 0")
    // balanced binary label: H(Y) = ln 2
    assert(math.abs(out("dep") - math.log(2.0)) < 1e-6)

    // a null category must contribute as its own cell, not vanish
    val withNull = Seq((Some("a"), 0), (Some("a"), 0), (None, 1), (None, 1))
      .toDF("f", "y")
    val mi = Statistics.mutualInformation(withNull,
        Seq("f" -> col("f")), col("y"))
      .collect().head.getDouble(2)
    assert(math.abs(mi - math.log(2.0)) < 1e-6,
      "null fully determines y here — dropping it would report 0")
  }

  test("isotonicFit: PAVA pooling via the minimax form") {
    // scores 1,2,3 with means 1, 3, 2 (equal weights): isotonic fit
    // pools the violating (3,2) pair → [1, 2.5, 2.5]
    val rows =
      Seq((1.0, 1.0), (1.0, 1.0),
        (2.0, 3.0), (2.0, 3.0),
        (3.0, 2.0), (3.0, 2.0)).map { case (x, y) => ("g", x, y) }
    val out = Statistics.isotonicFit(rows.toDF("k", "x", "y"),
        Seq("k"), col("x"), col("y"))
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(out(1.0) == 1.0 && out(2.0) == 2.5 && out(3.0) == 2.5)

    // already monotone ⇒ identity; keys fit independently
    val two = Seq(("a", 1.0, 0.0), ("a", 2.0, 1.0),
      ("b", 1.0, 1.0), ("b", 2.0, 0.0)).toDF("k", "x", "y")
    val fit = Statistics.isotonicFit(two, Seq("k"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3))
      .toMap
    assert(fit(("a", 1.0)) == 0.0 && fit(("a", 2.0)) == 1.0)
    assert(fit(("b", 1.0)) == 0.5 && fit(("b", 2.0)) == 0.5,
      "decreasing pair pools to its mean")

    // bounded-domain guard fires on an unbounded score
    val wide = (1 to 50).map(i => ("g", i.toDouble, 1.0)).toDF("k", "x", "y")
    intercept[IllegalArgumentException] {
      Statistics.isotonicFit(wide, Seq("k"), col("x"), col("y"),
        maxDistinct = 10)
    }
  }

  test("NormalizeUnicode: NFC composes, NFKC folds compatibility " +
    "forms, canonicalText collapses") {
    val df = Seq(
      ("e\u0301clair", "nfc"),        // decomposed accent
      ("ﬁle", "nfkc"),             // ﬁ ligature
      ("  A\u0301   B  ", "canon"))
      .toDF("s", "tag")
    val nfc = df.filter(col("tag") === "nfc")
      .select(TextNormalize.normalize(col("s"))).collect().head.getString(0)
    assert(nfc == "éclair", "e + U+0301 must compose to é")
    val nfkc = df.filter(col("tag") === "nfkc")
      .select(TextNormalize.normalize(col("s"), "NFKC"))
      .collect().head.getString(0)
    assert(nfkc == "file", "NFKC folds the ﬁ ligature")
    // NFC leaves the ligature alone (compatibility vs canonical)
    val nfcLig = df.filter(col("tag") === "nfkc")
      .select(TextNormalize.normalize(col("s"))).collect().head.getString(0)
    assert(nfcLig == "ﬁle")
    val canon = df.filter(col("tag") === "canon")
      .select(TextNormalize.canonicalText(col("s")))
      .collect().head.getString(0)
    assert(canon == "á b", "compose + casefold + collapse + trim")
    // nulls stay null through the expression
    val n = Seq(Option.empty[String]).toDF("s")
      .select(TextNormalize.normalize(col("s"))).collect().head
    assert(n.isNullAt(0))
    // invalid form rejected at construction
    intercept[IllegalArgumentException] {
      TextNormalize.normalize(col("s"), "NFX")
    }
  }

  test("featureHash: buckets are charPolyHash mod dim; collisions sum") {
    import graft.functions.TextHash
    import graft.ops.TextAnalysis
    val df = Seq((1L, "alpha beta alpha"), (2L, "Beta  beta")).toDF("id", "t")
    val out = TextAnalysis.featureHash(df, "id", "t", dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def b(tok: String): Long = {
      val h = Seq(Tuple1(tok)).toDF("s")
        .select(TextHash.charPolyHash(col("s"))).collect().head.getLong(0)
      ((h % 64) + 64) % 64
    }
    assert(out((1L, b("alpha"))) == 2L)
    assert(out((1L, b("beta"))) == 1L)
    // casefold + whitespace-run tokenization: "Beta  beta" → beta ×2
    assert(out((2L, b("beta"))) == 2L)
    assert(out.keys.count(_._1 == 2L) == 1)
    // dim 1: everything collides into bucket 0 — tf sums, never drops
    val one = TextAnalysis.featureHash(df, "id", "t", dim = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one(1L) == 3L && one(2L) == 2L)
  }

  test("ahashNearDupPairs: banded candidates + exact verify — finds " +
    "every pair ≤ maxHamming, drops spread-out near misses") {
    import graft.ops.Multimodal
    // base hash, a 2-bit variant (both flips in one band), an exact
    // dup, and a 4-bit variant with ONE flip in EACH band (no band
    // matches base — the candidate never exists, and it must not:
    // hamming 4 > 3)
    val base = (0x0F0F0F0FL, 0x00FF00FFL)
    val twoBits = (base._1 ^ 0x3L, base._2) // bits 0,1 of hi band 2
    val fourSpread = (base._1 ^ 0x00010001L, base._2 ^ 0x00010001L)
    val rows = Seq(
      (1L, base._1, base._2),
      (2L, twoBits._1, twoBits._2),
      (3L, base._1, base._2),
      (4L, fourSpread._1, fourSpread._2))
      .toDF("id", "h", "l")
    val out = Multimodal.ahashNearDupPairs(rows, "id", "h", "l")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 3L)) == 0, "exact dup at hamming 0")
    assert(out((1L, 2L)) == 2 && out((2L, 3L)) == 2)
    assert(!out.contains((1L, 4L)) && !out.contains((3L, 4L)),
      "hamming-4 pair excluded even when bands would catch it")
    assert(out.size == 3)
    // null hash halves are skipped, not joined
    val withNull = Seq((1L, Some(base._1), Some(base._2)),
      (2L, Option.empty[Long], Option.empty[Long])).toDF("id", "h", "l")
    assert(Multimodal.ahashNearDupPairs(withNull, "id", "h", "l")
      .count() == 0)
    intercept[IllegalArgumentException] {
      Multimodal.ahashNearDupPairs(rows, "id", "h", "l", maxHamming = 4)
    }
  }

  test("trailingDistinct: contribution explode = exact sliding " +
    "COUNT(DISTINCT), in-window repeats collapse, phantom days dropped") {
    import graft.ops.TemporalFeatures
    val df = Seq(
      ("k", 100L, 1L), ("k", 100L, 1L), // A on day 1 (twice)
      ("k", 100L, 3L),                  // A again day 3
      ("k", 200L, 3L))                  // B on day 3
      .toDF("g", "e", "d")
    val out = TemporalFeatures.trailingDistinct(df, Seq("g"),
        col("e"), col("d"), windowBuckets = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // observed days: 1 and 3 only (no phantom day 2/4/5 rows)
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L) == 1L, "day 1 window [−1..1]: A only")
    assert(out(3L) == 2L,
      "day 3 window [1..3]: A (active twice → once) + B")
  }

  test("negativeSample: no positives sampled, ≤k per user, " +
    "deterministic across runs, items from the catalog") {
    import graft.ops.Splits
    val inter = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "a"),
      (3L, "b"), (3L, "c"), (9L, "d"))
      .toDF("u", "it")
    val s1 = Splits.negativeSample(inter, "u", "it", k = 2, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val s2 = Splits.negativeSample(inter, "u", "it", k = 2, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(s1.sortBy(x => (x._1, x._3)).toSeq ==
      s2.sortBy(x => (x._1, x._3)).toSeq, "hash draws, not rand()")
    val positives = Set((1L, "a"), (1L, "b"), (2L, "a"), (3L, "a"),
      (3L, "b"), (3L, "c"), (9L, "d"))
    assert(s1.forall { case (u, it, _) => !positives((u, it)) },
      "a sampled pair must never be an interaction")
    assert(s1.forall { case (_, it, _) => Set("a", "b", "c", "d")(it) })
    s1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 2 &&
        rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // user 2 has 3 non-interacted items in a 4-item catalog: with 6
    // draws the oversampling should fill both slots
    assert(s1.count(_._1 == 2L) == 2)
  }

  test("negativeSample: forced-large catalog path (broadcastItemLimit " +
    "exceeded) shuffles instead of broadcasting, same results") {
    import graft.ops.Splits
    val inter = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "a"),
      (3L, "b"), (3L, "c"), (9L, "d"))
      .toDF("u", "it")
    val small = Splits.negativeSample(inter, "u", "it", k = 2, seed = 5L)
    // catalog has 4 items; limit 1 forces the no-broadcast join path
    val large = Splits.negativeSample(inter, "u", "it", k = 2, seed = 5L,
      broadcastItemLimit = 1L)
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .sortBy(x => (x._1, x._3)).toSeq
    assert(norm(small) == norm(large),
      "join strategy must not change the sampled set")
    // the guarded path carries no broadcast HINT on the catalog join
    // (AQE may still pick a broadcast at runtime from size estimates —
    // the point is the plan no longer FORCES a 10⁹-row build side)
    def logical(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.toString
    assert(logical(small).contains("ResolvedHint"))
    assert(!logical(large).contains("ResolvedHint"))
  }

  test("clusterRepresentatives: quality argmax, id tie-break, member " +
    "counts") {
    import graft.ops.Dedup
    val df = Seq(
      (10L, 1L, 5.0), (10L, 2L, 9.0), (10L, 3L, 9.0), // tie at 9 → id 2
      (20L, 7L, 1.0))                                  // singleton
      .toDF("cluster", "id", "q")
    val out = Dedup.clusterRepresentatives(df, "cluster", "id", col("q"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out(10L) == (2L, 9.0, 3L))
    assert(out(20L) == (7L, 1.0, 1L))
  }
}
