package graft

import graft.ops.{Ingest, IncrementalStats}
import org.apache.spark.sql.functions._

/** The steady-state ingest loop (q113's operator): cross-batch dedup
  * through the bounded fingerprint store composed with mergeable stat
  * partials — including the structural guarantee the design exists for:
  * after a batch is ingested, NO later step's physical plan reads that
  * batch's source again.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(rows: Seq[(Long, String, String, Long)],
                         dir: String): String = {
    rows.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("cross-batch dedup + merged moments match a direct replay") {
    val b1 = Seq((1L, "alpha beta", "en", 10L), (2L, "gamma delta", "en", 11L),
      (3L, "uno dos", "es", 7L))
    val b2 = Seq((4L, "alpha beta", "en", 10L), // dup of doc 1 → dropped
      (5L, "epsilon", "en", 7L))
    val b3 = Seq((6L, "uno dos", "es", 7L), // dup of doc 3 → dropped
      (7L, "zeta eta", "en", 8L), (8L, "epsilon", "en", 7L)) // dup of 5
    val batches = Seq(b1, b2, b3).zipWithIndex.map { case (rows, i) =>
      rows.toDF("doc_id", "text", "lang", "n_chars")
        .withColumn("b", lit(i.toLong))
    }
    val (accepted, merged, store) = Ingest.ingestAll(batches, "text",
      Seq("lang"), col("b"), col("n_chars"), expectedItems = 100L)
    val ids = accepted.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L, 5L, 7L)))
    // merged moments == a direct one-shot aggregate over the accepted set
    val direct = IncrementalStats.merge(
      IncrementalStats.partials(accepted, Seq("lang"), col("b"),
        col("n_chars")), Seq("lang"))
      .orderBy("lang").collect().toSeq
    assert(merged.orderBy("lang").collect().toSeq == direct)
    // the store holds exactly the distinct accepted fingerprints
    assert(store.count() == 5L)
  }

  test("25-batch steady state: loop-carried plans stay a CONSTANT node " +
    "count; ingestStream sinks per batch and matches a direct replay") {
    // batch i: 8 docs, half duplicating batch i-1 (steady dup pressure),
    // so the store grows every batch while per-batch work stays fixed
    def mkBatch(i: Int) = (0 until 8).map { j =>
      val fresh = j < 4
      val tag = if (fresh) s"b$i-$j" else s"b${i - 1}-${j - 4}"
      (i * 100L + j, s"document text $tag", if (j % 2 == 0) "en" else "de",
        10L + j)
    }.toDF("doc_id", "text", "lang", "n_chars").withColumn("b", lit(i.toLong))
    val batches = (0 until 25).map(mkBatch)

    // drive processBatch directly to observe every intermediate store
    var store = Ingest.emptyStore(spark)
    val storeNodes = scala.collection.mutable.ArrayBuffer[Int]()
    val partialNodes = scala.collection.mutable.ArrayBuffer[Int]()
    batches.foreach { b =>
      val r = Ingest.processBatch(b, store, "text", Seq("lang"), col("b"),
        col("n_chars"), expectedItems = 10000L)
      store = r.store
      storeNodes += store.queryExecution.logical.collect { case p => p }.size
      partialNodes += r.partials.queryExecution.logical
        .collect { case p => p }.size
    }
    // lineage is severed each step: every loop-carried plan is the same
    // single checkpointed block regardless of batch index
    assert(storeNodes.distinct.size == 1 && partialNodes.distinct.size == 1,
      s"loop-carried plan grew with batch index: stores=$storeNodes " +
        s"partials=$partialNodes")
    // batch 0 contributes 8 fresh docs; every later batch 4 — duplicates
    // land in the store exactly once
    assert(store.count() == 8L + 24L * 4L)

    // ingestStream: same fold, accepted rows sunk per batch
    val sunk = scala.collection.mutable.ArrayBuffer[Long]()
    val (merged, finalStore) = Ingest.ingestStream(batches, "text",
      Seq("lang"), col("b"), col("n_chars"),
      acceptedSink = df => sunk += df.count(),
      expectedItems = 10000L)
    assert(sunk.size == 25 && sunk.head == 8L && sunk.tail.forall(_ == 4L))
    assert(finalStore.count() == store.count())
    // merged stats plan reads only checkpointed partial blocks
    val mp = merged.queryExecution.executedPlan.toString
    assert(!mp.toLowerCase.contains("filescan"),
      s"merged-stats plan rescans batch sources:\n$mp")
    // and the moments match a direct replay over the union of accepted
    // docs (batch 0's 8 + 24 × 4 fresh ones)
    val acceptedAll = batches.zipWithIndex.map { case (b, i) =>
      if (i == 0) b
      else b.filter(col("doc_id") % 100 < 4) // the fresh half
    }.reduce(_ unionByName _)
    val direct = IncrementalStats.merge(
      IncrementalStats.partials(acceptedAll, Seq("lang"), col("b"),
        col("n_chars")), Seq("lang")).orderBy("lang").collect().toSeq
    assert(merged.orderBy("lang").collect().toSeq == direct)
  }

  test("no step after batch 1 rescans batch 1's source files") {
    val base = "/tmp/graft_ingest_spec"
    val p1 = writeBatch(Seq((1L, "one two", "en", 7L),
      (2L, "three four", "en", 10L)), s"$base/b1")
    val p2 = writeBatch(Seq((3L, "one two", "en", 7L),
      (4L, "five six", "en", 8L)), s"$base/b2")
    val p3 = writeBatch(Seq((5L, "five six", "en", 8L),
      (6L, "seven", "en", 5L)), s"$base/b3")
    def load(p: String, i: Long) =
      spark.read.parquet(p).withColumn("b", lit(i))
    val r1 = Ingest.processBatch(load(p1, 0), Ingest.emptyStore(spark),
      "text", Seq("lang"), col("b"), col("n_chars"), expectedItems = 100L)
    val r2 = Ingest.processBatch(load(p2, 1), r1.store,
      "text", Seq("lang"), col("b"), col("n_chars"), expectedItems = 100L)
    val r3 = Ingest.processBatch(load(p3, 2), r2.store,
      "text", Seq("lang"), col("b"), col("n_chars"), expectedItems = 100L)
    // batch-3 dedup semantics held (doc 5 is a dup of batch 2's doc 4)
    assert(r3.accepted.select("doc_id").collect().map(_.getLong(0))
      .sorted.sameElements(Array(6L)))
    // STRUCTURAL zero-rescan proof: batch 3's full physical plan — and
    // the final merged-stats plan — reference batch 3's files only; the
    // earlier batches survive solely as checkpointed store/partial blocks
    // (batch 3's own file scan happened exactly once, eagerly, at the
    // dedup's internal checkpoint — the accepted plan reads only
    // in-memory ExistingRDD blocks, so not even /b3 appears)
    val plan3 = r3.accepted.queryExecution.executedPlan.toString
    assert(!plan3.contains("/b1") && !plan3.contains("/b2"),
      s"batch-3 plan reaches back into history files:\n$plan3")
    val mergedPlan = IncrementalStats.merge(
      r1.partials.unionByName(r2.partials).unionByName(r3.partials),
      Seq("lang")).queryExecution.executedPlan.toString
    assert(!mergedPlan.contains("/b1") && !mergedPlan.contains("/b2") &&
      !mergedPlan.contains("/b3"),
      s"merged-stats plan rescans raw batches:\n$mergedPlan")
  }
}
