package graft

import graft.ops.{Multimodal, Packing, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Sequence packing and the audio decode kernel, both against brute-force
  * in-memory references.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val Vocab = 97
  private val SeqLen = 16

  private def hash(s: String): Long =
    graft.functions.TextHash.charPolyHash(UTF8String.fromString(s))

  /** Brute-force reference packing: same tokenization, hash vocab, order
    * key, and stream cut, computed sequentially on the driver.
    */
  private def referencePack(docs: Seq[(Long, String)])
      : Seq[(Long, Seq[Int], Int)] = {
    val ordered = docs.sortBy { case (id, text) =>
      (hash(text.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")),
        id)
    }
    val stream = ordered.flatMap { case (id, text) =>
      (text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(t => (math.floorMod(hash(t), Vocab).toInt, id)) :+ (Vocab, id))
    }
    stream.zipWithIndex.groupBy(_._2 / SeqLen).toSeq.sortBy(_._1)
      .map { case (seq, toks) =>
        (seq.toLong, toks.sortBy(_._2).map(_._1._1),
          toks.map(_._1._2).distinct.size)
      }
      .filter(_._2.size == SeqLen)
  }

  private def runPack(docs: Seq[(Long, String)]) = {
    val df = docs.toDF("doc_id", "text")
    Packing.packSequences(df, "doc_id", "text", SeqLen, Vocab,
        TextAnalysis.fingerprint(col("text")), nBuckets = 4)
      .orderBy("seq_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2).toInt))
      .toSeq
  }

  test("packSequences matches the brute-force reference stream") {
    val docs = (0L until 37L).map(i =>
      (i, s"alpha bravo${i % 5} charlie delta${i} " * (1 + (i % 7).toInt)))
    assert(runPack(docs) == referencePack(docs))
  }

  test("packSequences: documents span sequence boundaries, tail dropped") {
    // 3 docs x (5 tokens + EOS) = 18 tokens -> one 16-token sequence,
    // 2-token tail dropped; the middle doc straddles the boundary
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j"), (3L, "k l m n o"))
    val out = runPack(docs)
    val ref = referencePack(docs)
    assert(out == ref)
    assert(out.size == 1 && out.head._2.size == SeqLen)
  }

  test("packSequences: empty and null texts pack as EOS-only docs") {
    val docs = ((0L until 20L).map(i => (i, "w x y z")) :+ (98L, "")).toSeq
    val withNull = docs.toDF("doc_id", "text")
      .union(Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = Packing.packSequences(withNull, "doc_id", "text", SeqLen,
        Vocab, TextAnalysis.fingerprint(coalesce(col("text"), lit(""))),
        nBuckets = 4)
      .agg(sum(size(col("tokens"))), sum(col("n_docs"))).collect().head
    // 20*5 + 2 = 102 tokens -> 6 full sequences = 96 tokens kept
    assert(out.getLong(0) == 96L)
  }

  test("tokenChecksum is the positional polynomial over the ids") {
    val df = Seq(Tuple1(Seq(3, 1, 4))).toDF("t")
    val got = df.select(Packing.tokenChecksum(col("t"))).head.getLong(0)
    assert(got == ((3L * 31 + 1) * 31 + 4))
  }

  // ---------------------------------------------------------------- audio

  test("decodeWav roundtrips the planted closed form exactly") {
    val id = 41L
    val wav = Multimodal.decodeWav(Multimodal.plantedWav(id)).get
    assert(wav.sampleRate == 8000 && wav.channels == 1)
    val n = 64 + (id % 97).toInt
    assert(wav.samples.length == n)
    val expected = (0 until n)
      .map(i => (((id * 31 + i * 7L) % 4096) - 2048).toInt)
    assert(wav.samples.toSeq == expected)
  }

  test("decodeWav rejects garbage, truncation, and compressed formats") {
    assert(Multimodal.decodeWav(null).isEmpty)
    assert(Multimodal.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    val good = Multimodal.plantedWav(7L)
    assert(Multimodal.decodeWav(good.take(50)).isEmpty)
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    assert(Multimodal.decodeWav(notRiff).isEmpty)
    val mulaw = good.clone(); mulaw(20) = 7 // audioFormat != 1 (PCM)
    assert(Multimodal.decodeWav(mulaw).isEmpty)
  }

  test("decodeWav takes channel 0 of interleaved stereo") {
    // hand-assemble a stereo WAV: L = 100+i, R = -(100+i)
    val n = 8
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    bos.write("RIFF".getBytes); w32(36 + n * 4); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16); w16(1); w16(2); w32(16000)
    w32(16000 * 4); w16(4); w16(16)
    bos.write("data".getBytes); w32(n * 4)
    (0 until n).foreach { i => w16(100 + i); w16(-(100 + i) & 0xffff) }
    val wav = Multimodal.decodeWav(bos.toByteArray).get
    assert(wav.channels == 2 && wav.sampleRate == 16000)
    assert(wav.samples.toSeq == (0 until n).map(100 + _))
  }

  test("audioFrameFeatures matches a brute-force frame computation") {
    val df = (0L until 9L).toDF("doc_id")
    val frameLen = 10
    val rows = Multimodal
      .audioFrameFeatures(Multimodal.withPlantedWav(df, "doc_id", "wav"),
        "wav", frameLen)
      .select("doc_id", "frame_idx", "frame_sum_sq", "frame_sum_abs",
        "frame_zc", "n_samples")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    val expected = (0L until 9L).flatMap { id =>
      val n = 64 + (id % 97).toInt
      val s = (0 until n).map(i => (((id * 31 + i * 7L) % 4096) - 2048).toInt)
      (0 until n / frameLen).map { f =>
        val fr = s.slice(f * frameLen, (f + 1) * frameLen)
        val zc = fr.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
        (id, f, fr.map(v => v.toLong * v).sum,
          fr.map(v => math.abs(v.toLong)).sum, zc.toLong, n.toLong)
      }
    }
    assert(rows.toSeq == expected)
  }
}
