package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GPT-style sequence packing for training-data export.
  *
  * LLM pre-training consumes fixed-length token sequences, not documents:
  * every document is tokenized, terminated with an EOS token, the token
  * streams are concatenated in a deterministic content-shuffled order, and
  * the resulting global stream is cut into consecutive `seqLen`-token
  * sequences — documents SPAN sequence boundaries (no padding waste), and
  * the final partial sequence is dropped. This is the packing step that
  * sits between the curation operators ([[Dedup]], [[TextAnalysis]],
  * [[Splits]]) and the trainer; [[Sharding.tokenBudgetBins]] solves the
  * coarser cousin (whole-document shard assignment), this operator
  * produces the exact per-sequence token arrays.
  *
  * Scale shape (the 100 TB question): one distributed prefix sum over
  * per-document token counts ([[Sharding.globalExclusiveOffsets]] — range
  * buckets + local windows, never a single-partition window), one
  * `posexplode`-shaped slice fan-out (a document emits one row per
  * sequence it overlaps: `L/seqLen + 1` rows), and ONE shuffle by
  * sequence id whose groups are bounded at `seqLen` tokens regardless of
  * corpus size. Token arrays ride the window shuffle as payload; no
  * driver state beyond the `nBuckets`-row offset table.
  */
object Packing {

  /** Hash-vocabulary token ids: whitespace tokens of the lowercased text,
    * each mapped to `charPolyHash(token) mod vocab` — a deterministic,
    * engine-replayable stand-in for a learned BPE vocabulary (ids in
    * `[0, vocab)`; the EOS id is `vocab` itself, outside the hash range).
    * Null text tokenizes as empty (EOS-only document), not null.
    */
  def tokenIds(text: Column, vocab: Int): Column = {
    require(vocab > 0, "vocab must be positive")
    transform(
      filter(split(lower(coalesce(text, lit(""))), "\\s+"),
        t => length(t) > 0),
      t => pmod(graft.functions.TextHash.charPolyHash(t), lit(vocab.toLong))
        .cast("int"))
  }

  /** 52-bit polynomial checksum of a token-id array (the array analog of
    * [[graft.functions.TextHash.charPolyHash]]): a SQL-replayable witness
    * that two engines produced the identical packed stream.
    */
  def tokenChecksum(tokens: Column): Column =
    aggregate(tokens, lit(0L),
      (h, t) => (h * lit(31L) + t.cast("long"))
        .bitwiseAND(lit(graft.functions.TextHash.Mask)))

  /** Pack documents into fixed-`seqLen` token sequences.
    *
    * @param orderKeyCol deterministic global order key (content shuffle);
    *                    same domain contract as
    *                    [[Sharding.tokenBudgetBins]]: non-null, in
    *                    `[0, 2^keyBits)` — e.g.
    *                    [[TextAnalysis.fingerprint]] of the text. Ties
    *                    break on `idCol`.
    * @return one row per COMPLETE sequence:
    *         (seq_id, tokens array&lt;int&gt; of exactly seqLen, n_docs) —
    *         `n_docs` counts the documents contributing ≥1 token.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, vocab: Int, orderKeyCol: Column,
                    keyBits: Int = 52, nBuckets: Int = 256): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val docs = df.select(col(idCol), col(textCol))
      .withColumn("_pt", lit(""))
      .withColumn("_toks",
        concat(tokenIds(col(textCol), vocab), array(lit(vocab))))
    val off = Sharding.globalExclusiveOffsets(docs, idCol,
      size(col("_toks")).cast("long"), orderKeyCol, keyBits, nBuckets,
      payload = Seq("_toks"))

    // fan each document out to the sequences it overlaps; slice bounds in
    // doc-local 0-based coordinates, position in sequence-local coordinates
    val slices = off.select(col(idCol), col("_toks"),
        col("_gex").as("_s"), col("_tok").as("_len"),
        explode(sequence(expr(s"_gex div $seqLen"),
          expr(s"(_gex + _tok - 1) div $seqLen"))).as("seq_id"))
      .withColumn("_from", greatest(lit(0L), col("seq_id") * seqLen - col("_s")))
      .withColumn("_until",
        least(col("_len"), (col("seq_id") + 1) * seqLen - col("_s")))
      .select(col(idCol), col("seq_id"),
        (col("_s") + col("_from") - col("seq_id") * seqLen).cast("int").as("_pos"),
        slice(col("_toks"), (col("_from") + 1).cast("int"),
          (col("_until") - col("_from")).cast("int")).as("_piece"))

    slices.groupBy("seq_id")
      .agg(flatten(array_sort(collect_list(struct(col("_pos"), col("_piece"))))
          .getField("_piece")).as("tokens"),
        count(lit(1)).cast("long").as("n_docs"))
      .where(size(col("tokens")) === seqLen)
  }
}
