package graft

import graft.ops.{Similarity, Statistics, TemporalFeatures, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants for the round-12 operators: mathematical
  * bounds that must hold on ANY input — the hand-value specs prove
  * specific points; these prove the operators can't leave their
  * domains on generated data.
  */
class R12InvariantSpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int = 8)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  // two rankings over a shared id pool: (qid, id, rank) with rank a
  // permutation position 1..k of a sampled subset
  private val rankingsGen: Gen[(List[(Long, Long, Int)], List[(Long, Long, Int)])] = {
    def one(qids: Seq[Long], pool: Seq[Long]): Gen[List[(Long, Long, Int)]] =
      qids.foldLeft(Gen.const(List.empty[(Long, Long, Int)])) { (acc, q) =>
        for {
          l <- acc
          ids <- Gen.pick(5, pool)
        } yield l ++ ids.toList.zipWithIndex.map {
          case (id, i) => (q, id, i + 1) }
      }
    for {
      a <- one(Seq(1L, 2L, 3L), 10L to 25L)
      b <- one(Seq(1L, 2L, 3L), 10L to 25L)
    } yield (a, b)
  }

  test("invariants: RBO in [0, 1 − p^k]; tau in [−1, 1]; both agree " +
    "on n_common") {
    forSamples(rankingsGen) { case (a, b) =>
      val da = a.toDF("qid", "id", "rnk")
      val db = b.toDF("qid", "id", "rnk")
      val rbo = Similarity.rankBiasedOverlap(da, db, "qid", "id", "rnk",
        k = 5, p = 0.8).collect()
      val cap = 1.0 - math.pow(0.8, 5) + 1e-9
      rbo.foreach { r =>
        val v = r.getDouble(2)
        assert(v >= 0.0 && v <= cap, s"rbo out of range: $v")
      }
      val tau = Similarity.kendallTau(da, db, "qid", "id", "rnk", k = 5)
        .collect()
      tau.foreach { r =>
        if (!r.isNullAt(5)) {
          val t = r.getDouble(5)
          assert(t >= -1.0 && t <= 1.0, s"tau out of range: $t")
        }
      }
      val nc1 = rbo.map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nc2 = tau.map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(nc1 == nc2, "RBO and tau must see the same common sets")
    }
  }

  test("invariants: kaplanMeier survival is non-increasing in t and " +
    "stays in [0, 1]") {
    val durGen = Gen.listOfN(60, for {
      t <- Gen.choose(1L, 12L)
      ev <- Gen.oneOf(true, false)
    } yield (t, ev))
    forSamples(durGen) { rows =>
      val out = TemporalFeatures.kaplanMeier(rows.toDF("dur", "ev"),
          col("dur"), col("ev"))
        .orderBy("t").collect()
        .map(r => (r.getLong(0), r.getDouble(4)))
      out.foreach { case (_, s) =>
        assert(s >= 0.0 && s <= 1.0, s"survival out of [0,1]: $s") }
      out.sliding(2).foreach {
        case Array((t1, s1), (t2, s2)) =>
          assert(s2 <= s1 + 1e-9,
            s"survival must not increase: S($t1)=$s1 < S($t2)=$s2")
        case _ =>
      }
    }
  }

  test("invariants: HHI in [1/n_members, 1]; tokenJsd and jsdDrift in " +
    "[0, ln 2]") {
    val memGen = Gen.listOfN(80, for {
      g <- Gen.oneOf("g1", "g2")
      m <- Gen.choose(0, 9)
    } yield (g, s"m$m"))
    forSamples(memGen) { rows =>
      Statistics.hhiConcentration(rows.toDF("g", "m"), Seq("g"),
          col("m"))
        .collect().foreach { r =>
          val (n, h) = (r.getLong(1), r.getDouble(3))
          assert(h >= 1.0 / n - 1e-9 && h <= 1.0 + 1e-9,
            s"hhi out of [1/$n, 1]: $h")
        }
    }
    val docGen = Gen.listOfN(30, for {
      w <- Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d", "e"))
      r <- Gen.oneOf(true, false)
    } yield (w.mkString(" "), r))
    forSamples(docGen) { rows =>
      val df = rows.toDF("text", "r")
      // degenerate single-sided samples have no distribution pair
      if (rows.exists(_._2) && rows.exists(!_._2)) {
        val j = TextAnalysis.tokenJsd(df, col("text"), col("r"))
          .collect().head.getAs[Double]("jsd")
        assert(j >= 0.0 && j <= math.log(2.0) + 1e-9,
          s"tokenJsd out of [0, ln2]: $j")
      }
    }
  }

  test("invariants: charEntropy bounded by log2(distinct chars); " +
    "scriptMix ratios sum to at most 1") {
    val txtGen = Gen.listOfN(12,
      Gen.listOfN(20, Gen.oneOf(('a' to 'f') ++ Seq(' ', '1', '中')))
        .map(_.mkString))
    forSamples(txtGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      TextAnalysis.charEntropy(df, "id", "text").collect().foreach { r =>
        val (nd, h) = (r.getLong(2), r.getDouble(3))
        val cap = math.log(nd.toDouble) / math.log(2.0) + 1e-4
        assert(h >= -0.0001 && h <= cap,
          s"entropy $h exceeds log2($nd)")
      }
      TextAnalysis.scriptMix(df, "id", "text").collect().foreach { r =>
        val s = r.getDouble(1) + r.getDouble(2) + r.getDouble(3) +
          r.getDouble(4)
        assert(s <= 1.0 + 1e-3, s"script ratios sum past 1: $s")
        Seq(1, 2, 3, 4).foreach(i =>
          assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0))
      }
    }
  }
}
