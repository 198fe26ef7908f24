package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Ingest
import graft.ops.Materialize.PinOps

/** Scale evidence for the steady-state ingest loop (VERDICT r9 #4):
  * drive [[Ingest.ingestStream]] for 24 equal-size batches over the
  * documents table and time EACH batch. The design claim is that
  * per-batch cost is independent of history size — batch 24 sees a
  * store 20× the size batch 1 did, but pays the same: one batch scan,
  * one bloom over |distinct docs| fingerprint longs, one sliver
  * anti-join, one map-side-combined partial. A loop that rescanned
  * history (the reference's recompute-per-window engine shape) would
  * show per-batch time growing linearly in the batch index.
  *
  * Batches alternate fresh/duplicate halves (batch i duplicates batch
  * i−1's fresh half), so dedup pressure is steady and the store grows
  * every batch. Accepted rows sink per batch through a noop write —
  * the production shape, nothing accumulated driver-side.
  *
  * Emits one JSON line: first-3-batch vs last-3-batch average seconds
  * and the full per-batch curve.
  *
  * Usage: `runMain graft.tools.IngestSteadyProbe [sfDir] [out.json]`
  */
object IngestSteadyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = graft.SparkSessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "ingest-steady-probe")
    try {
      val nBatches = 24
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        .pinned(true) // source cost out of the measurement
      val batchRows = docs.count()
      // batch i = a fresh half (every doc tagged #i) ∪ a duplicate half
      // (every doc tagged #i−1 — byte-identical to batch i−1's fresh
      // half), so every batch after the first drops 50% and the store
      // grows |docs| fingerprints per batch
      def half(tag: Int) = docs.withColumn("text",
        concat(col("text"), lit(s" #$tag")))
      def mkBatch(i: Int) = half(i).unionByName(half(i - 1))
        .withColumn("b", lit(i.toLong))

      var store = Ingest.emptyStore(spark)
      var partialsAcc: org.apache.spark.sql.DataFrame = null
      val perBatch = (0 until nBatches).map { i =>
        val batch = mkBatch(i)
        val t0 = System.nanoTime()
        val r = Ingest.processBatch(batch, store, "text", Seq("lang"),
          col("b"), col("n_chars"), expectedItems = 1000000L)
        r.accepted.write.format("noop").mode("overwrite").save()
        store = r.store
        partialsAcc =
          if (partialsAcc == null) r.partials
          else partialsAcc.unionByName(r.partials).pinned(true)
        (System.nanoTime() - t0) / 1e9
      }
      val first3 = perBatch.slice(1, 4).sum / 3 // skip batch 0 (warmup)
      val last3 = perBatch.takeRight(3).sum / 3
      val curve = perBatch.map(t => f"$t%.3f").mkString("[", ",", "]")
      val json =
        s"""{"metric":"ingest_steady_state","batches":$nBatches,""" +
          s""""batch_rows":${batchRows * 2},""" +
          f""""first3_sec":$first3%.3f,"last3_sec":$last3%.3f,""" +
          f""""last_over_first":${last3 / first3}%.2f,""" +
          s""""per_batch_sec":$curve}"""
      // scalastyle:off println
      println(json)
      // scalastyle:on println
      args.lift(1).foreach { p =>
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          (json + "\n").getBytes("UTF-8"))
      }
    } finally spark.stop()
  }
}
