package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (BASELINE.json north star; not present in the reference client, which
  * dedups only on upsert keys — core/hudi_engine.py:141-149).
  *
  * All operators are pure DataFrame algebra (codegen-friendly, no UDFs):
  *
  *  - [[exact]] — hash-groupBy on content columns; one shuffle of
  *    (hash, id) pairs, deterministic survivor (min id).
  *  - [[minHashLsh]] — shingle → k min-hashes → band buckets → bucket
  *    self-join. The candidate join shuffles only (band, signature)
  *    buckets, never the full cross product; pairs are verified with the
  *    exact shingle-set Jaccard before reporting.
  *  - [[simHash]] — 64-bit weighted-token fingerprint; near-dups share a
  *    16-bit chunk (Hamming ≤ 3 ⇒ some chunk equal by pigeonhole).
  *  - [[tokenJaccard]] — exact token-set Jaccard similarity join
  *    (explode + count intersection); quadratic only within shared-token
  *    groups.
  *  - [[embeddingNearDup]] — cosine-threshold pairs via the LSH bucketing
  *    of [[Similarity]].
  */
object Dedup {

  /** Exact dedup: one surviving row (smallest `idCol`) per distinct
    * combination of `on` columns.
    *
    * The window partitions by (xxhash64, content columns): the hash comes
    * first so sort comparisons short-circuit cheaply on 8 bytes, but the
    * grouping compares the actual column VALUES — a 64-bit hash collision
    * (expected by the birthday bound at ≥10⁹ documents) therefore lands in
    * the same shuffle partition yet can never merge two distinct rows.
    */
  def exact(df: DataFrame, idCol: String, on: Seq[String]): DataFrame =
    exactImpl(df, idCol, on, xxhash64(on.map(col): _*))

  /** Test seam: `h` lets specs force total hash collision to prove the
    * content comparison keeps distinct rows apart.
    */
  private[graft] def exactImpl(df: DataFrame, idCol: String,
                               on: Seq[String], h: Column): DataFrame = {
    val w = Window.partitionBy(h +: on.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Word shingles (n-grams of the whitespace-tokenized text), distinct per
    * document, as (id, shingle-hash) pairs. `transform` over a slide of the
    * token array keeps this in native expressions.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String,
               n: Int = 3): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    df.select(col(idCol),
        explode(transform(idx, i =>
          xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n)))))).as("shingle"))
      .distinct()
  }

  /** MinHash signatures: k independent permutations approximated by
    * k seeded hashes; signature = per-doc min of each. One groupBy over the
    * exploded shingles.
    */
  def minHashSignatures(shingled: DataFrame, idCol: String,
                        numHashes: Int = 64): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(hash(col("shingle"), lit(i))).as(s"h$i"))
    shingled.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Per-document distinct shingle-hash ARRAY — computed entirely
    * row-locally (tokenize → slide → hash → distinct within one
    * expression), so signature derivation needs no shuffle at all.
    */
  def shingleArray(textCol: Column, n: Int): Column = {
    val toks = split(lower(textCol), "\\s+")
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(transform(idx, i =>
      xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Candidate near-dup pairs by banded LSH + exact Jaccard verification.
    *
    * Scale shape: shingle sets and MinHash signatures are document-local
    * array expressions (zero shuffle); the only shuffles are the banded
    * candidate self-join (keyed on (band, bandHash) — matching buckets
    * only, never the O(n²) pair space) and the candidate verification,
    * which joins the shingle arrays back onto the (small) candidate pair
    * set and intersects them in-place.
    *
    * @return (idA, idB, jaccard) with idA < idB and jaccard ≥ threshold
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleSize: Int = 3, numHashes: Int = 64,
                 bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withShingles = df
      .select(col(idCol), shingleArray(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()

    // signatures via exploded shingles + 64 codegen'd min-aggregates (the
    // whole-row lambda form recomputes the k×|shingles| hash matrix once
    // per band — measured 4× slower); `sig` lands as a materialized column
    // so banding slices it without re-evaluation
    val sigs = minHashSignatures(
      withShingles.select(col(idCol), explode(col("sh")).as("shingle")),
      idCol, numHashes)
    val banded = sigs
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          hash(slice(col("sig"), b * rows + 1, lit(rows))))).as(Seq("band", "bh")))

    val left = banded.select(col(idCol).as("idA"), col("band"), col("bh"))
    val rightB = banded.select(col(idCol).as("idB"), col("band"), col("bh"))
    val candidates = left.join(rightB, Seq("band", "bh"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB").distinct()

    val verified = candidates
      .join(withShingles.select(col(idCol).as("idA"), col("sh").as("shA")), "idA")
      .join(withShingles.select(col(idCol).as("idB"), col("sh").as("shB")), "idB")
      .select(col("idA"), col("idB"),
        (size(array_intersect(col("shA"), col("shB"))).cast("double") /
          size(array_union(col("shA"), col("shB")))).as("jaccard"))
    verified.filter(col("jaccard") >= threshold)
  }

  /** Number of SimHash signature bits: the token hash is the 52-bit
    * [[graft.functions.TextHash.CharPolyHash]] (oracle-reproducible in
    * plain SQL — the reason it replaced xxhash64 here).
    */
  val SimHashBits = 52

  /** SimHash: weighted sum of token-hash bits, one groupBy pass.
    * Documents with Hamming-close fingerprints are near-duplicates.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("h", graft.functions.TextHash.charPolyHash(col("tok")))
    val bitSums = (0 until SimHashBits).map(b =>
      sum(when(shiftrightunsigned(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b"))
    val agg = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until SimHashBits).map(b =>
        when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** Near-dup pairs by SimHash: candidates share one of four 13-bit chunks
    * (pigeonhole: Hamming ≤ 3 ⇒ at least one chunk identical), verified by
    * exact Hamming distance ≤ maxHamming.
    */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sigs = simHash(df, idCol, textCol)
    val chunked = sigs.select(col(idCol), col("simhash"), posexplode(
      array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 13).bitwiseAND(0x1FFFL)): _*))
      .as(Seq("chunk", "cv")))
    val l = chunked.select(col(idCol).as("idA"), col("simhash").as("sigA"),
      col("chunk"), col("cv"))
    val r = chunked.select(col(idCol).as("idB"), col("simhash").as("sigB"),
      col("chunk"), col("cv"))
    l.join(r, Seq("chunk", "cv"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("sigA").bitwiseXOR(col("sigB"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact token-set Jaccard similarity join over all pairs sharing at
    * least one token (n=1 shingles). For bounded corpora / oracle checks;
    * use [[minHashLsh]] at scale.
    */
  def tokenJaccard(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    val toks = df.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0).distinct()
    val sizes = toks.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = toks.select(col(idCol).as("idA"), col("tok"))
    val b = toks.select(col(idCol).as("idB"), col("tok"))
    val inter = a.join(b, "tok").filter(col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("idA"), col("sz").as("szA")), "idA")
      .join(sizes.select(col(idCol).as("idB"), col("sz").as("szB")), "idB")
      .select(col("idA"), col("idB"),
        (col("inter") / (col("szA") + col("szB") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold via multi-table
    * hyperplane-LSH bucketing — both sides bucketed per table, candidate
    * pairs only within shared (table, bucket) groups, never all-pairs.
    * `nTables` independent signatures multiply recall at linear candidate
    * cost (a single table misses ~(1-p^nBits) of true pairs; with
    * cos ≈ 0.97, 12 tables of 8 bits give >99.9% per-pair recall).
    */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, threshold: Double,
                       nBits: Int = 8, nTables: Int = 12,
                       seed: Int = 42): DataFrame = {
    val cos = VectorFunctions.vecCosine(col(s"${vecCol}A"), col(s"${vecCol}B"))
    val sigs = (0 until nTables).map(t =>
      Similarity.signatureFor(col(vecCol), dim, nBits, seed + t * 7919))
    val bucketed = df.select(col(idCol), col(vecCol),
      posexplode(array(sigs: _*)).as(Seq("_table", "_bucket")))
    val l = bucketed.select(col(idCol).as("idA"),
      col(vecCol).as(s"${vecCol}A"), col("_table"), col("_bucket"))
    val r = bucketed.select(col(idCol).as("idB"),
      col(vecCol).as(s"${vecCol}B"), col("_table"), col("_bucket"))
    // a true pair collides in most of the nTables tables — deduplicate the
    // candidate (idA, idB) BEFORE scoring (the vectors ride along; they are
    // identical for every duplicate of a pair) so the O(dim) cosine runs
    // once per pair, not once per (table, bucket) collision
    l.join(r, Seq("_table", "_bucket"))
      .filter(col("idA") < col("idB"))
      .dropDuplicates("idA", "idB")
      .select(col("idA"), col("idB"), cos.as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
