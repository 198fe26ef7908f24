package graft

import graft.ops.{Splits, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-9 additions: overlapping token chunking and deterministic
  * weighted sampling — edge cases plus the statistical property that
  * justifies the A-ES construction (inclusion frequency tracks weight
  * across independent salts).
  */
class SamplingChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunking: every token covered, overlap exact, tail kept") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, "doc_id", "text",
      chunkSize = 4, overlap = 1).orderBy("chunk_idx").collect()
    // starts 0,3,6,9 → chunks [1-4],[4-7],[7-10],[10]
    assert(out.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(out.map(_.getAs[Int]("n_tokens")).toSeq == Seq(4, 4, 4, 1))
  }

  test("chunking: short and empty documents yield exactly one chunk") {
    val df = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, "doc_id", "text", 64, 16)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("n_tokens"), r.getAs[String]("chunk_text"))).toMap
    assert(out(1L) == ((2, "a b")))
    assert(out(2L) == ((0, "")) && out(3L) == ((0, "")))
    assert(out.size == 3)
  }

  test("weighted sample: deterministic, k-bounded, weight-monotone frequency") {
    val rows = (1 to 200).map(i => (i.toLong, if (i <= 100) 1L else 10L))
    val df = rows.toDF("id", "w")
    val first = Splits.weightedSample(df, "id", col("w"), k = 40)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val again = Splits.weightedSample(df, "id", col("w"), k = 40)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(first == again, "same salt → same sample")
    assert(first.size == 40)
    // frequency ∝ weight: across 30 salts, heavy ids (w=10) must be
    // selected far more often than light ids (w=1). With k=40 of 200
    // and a 10:1 weight ratio, heavies dominate the sample.
    val counts = (1 to 30).flatMap { s =>
      Splits.weightedSample(df, "id", col("w"), k = 40, salt = s"s$s")
        .select("id").collect().map(_.getLong(0))
    }
    val heavy = counts.count(_ > 100).toDouble
    val light = counts.count(_ <= 100).toDouble
    assert(heavy > light * 3,
      s"heavy rows must dominate: heavy=$heavy light=$light")
  }

  test("weighted sample: per-key top-k and null/zero-weight rows dropped") {
    val df = Seq((1L, "a", Some(5L)), (2L, "a", Some(5L)),
      (3L, "a", None), (4L, "b", Some(0L)), (5L, "b", Some(2L)))
      .toDF("id", "g", "w")
    val out = Splits.weightedSample(df, "id", col("w"), k = 2,
      keys = Seq("g")).collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 5L),
      "null and zero weights can never be drawn")
  }
}
