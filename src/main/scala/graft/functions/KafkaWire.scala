package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Kafka v2 record-batch framing (the PUBLIC wire format: KIP-98's
  * RecordBatch layout, as documented in Kafka's protocol guide) — the
  * PRODUCE-side byte layout the `spark-sql-kafka-0-10` connector would
  * emit around our [[AvroCodec]] payloads. The connector jar is absent
  * from this environment (COVERAGE §2.9 retry trail, rounds 4-10), so
  * the broker-protocol hop cannot run; what CAN be proven is the
  * record-batch bytes themselves, the same way q114 proves the Avro
  * value bytes — golden framing in KafkaWireSpec, byte-width oracle in
  * SQL (q143).
  *
  * Layout (all multi-byte integers BIG-endian; varints are protobuf
  * zigzag, same encoding Avro uses):
  *
  * {{{
  * RecordBatch =>
  *   baseOffset:int64 batchLength:int32 partitionLeaderEpoch:int32
  *   magic:int8(=2) crc:uint32 attributes:int16 lastOffsetDelta:int32
  *   baseTimestamp:int64 maxTimestamp:int64 producerId:int64(-1)
  *   producerEpoch:int16(-1) baseSequence:int32(-1) recordsCount:int32
  *   records...                                     // 61-byte header
  * Record =>
  *   length:varint attributes:int8 timestampDelta:varlong
  *   offsetDelta:varint keyLength:varint key valueLength:varint value
  *   headersCount:varint [hKeyLen:varint hKey hValLen:varint hVal]*
  * }}}
  *
  * `crc` is CRC32C (Castagnoli — the same polynomial TFRecord uses,
  * `java.util.zip.CRC32C`) over everything AFTER the crc field;
  * `batchLength` counts everything after itself. A producer stamps
  * `baseOffset = 0` (the broker assigns real offsets on append), and
  * null keys/values encode as varint length −1.
  *
  * Scale shape: one row-local `mapPartitions` pass, records grouped
  * into batches within each partition — the producer's own batching
  * model (a batch never spans partitions), no shuffle, applied after
  * [[AvroCodec.toAvroWire]]'s encode. Compression (attributes bits
  * 0-2) is left 0 = none; the lake path owns compression here, and
  * uncompressed batches keep the bytes deterministic for the oracle.
  */
object KafkaWire {

  private final class Buf(initial: Int = 256) {
    var arr = new Array[Byte](initial)
    var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        val na = new Array[Byte](math.max(arr.length * 2, len + n))
        System.arraycopy(arr, 0, na, 0, len); arr = na
      }
    def byte(b: Int): Unit = { ensure(1); arr(len) = b.toByte; len += 1 }
    def bytes(b: Array[Byte]): Unit = {
      ensure(b.length); System.arraycopy(b, 0, arr, len, b.length)
      len += b.length
    }
    /** Protobuf/Avro zigzag varint (Kafka records use the same). */
    def zigzag(v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63)
      while ((v & ~0x7fL) != 0) { byte(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      byte(v.toInt)
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  /** One v2 Record (the varint-framed inner message). `timestampDelta`
    * and `offsetDelta` are relative to the batch base; null key/value
    * → length −1, no bytes.
    */
  private[graft] def record(timestampDelta: Long, offsetDelta: Int,
                            key: Array[Byte], value: Array[Byte],
                            headers: Seq[(String, Array[Byte])])
      : Array[Byte] = {
    val body = new Buf(64)
    body.byte(0) // record attributes: unused, must be 0
    body.zigzag(timestampDelta)
    body.zigzag(offsetDelta.toLong)
    if (key == null) body.zigzag(-1L)
    else { body.zigzag(key.length.toLong); body.bytes(key) }
    if (value == null) body.zigzag(-1L)
    else { body.zigzag(value.length.toLong); body.bytes(value) }
    body.zigzag(headers.size.toLong)
    headers.foreach { case (hk, hv) =>
      val kb = hk.getBytes("UTF-8")
      body.zigzag(kb.length.toLong); body.bytes(kb)
      if (hv == null) body.zigzag(-1L)
      else { body.zigzag(hv.length.toLong); body.bytes(hv) }
    }
    val framed = new Buf(body.len + 4)
    framed.zigzag(body.len.toLong)
    framed.bytes(body.toArray)
    framed.toArray
  }

  /** The 61-byte batch header size (Kafka's RECORD_BATCH_OVERHEAD). */
  val BatchHeaderBytes = 61

  /** One v2 RecordBatch around already-framed records. Producer-side
    * conventions: baseOffset 0, partitionLeaderEpoch −1, producerId −1
    * (non-transactional, non-idempotent), attributes 0 (no
    * compression, CREATE_TIME).
    */
  private[graft] def batch(records: Seq[Array[Byte]], baseTimestamp: Long,
                           maxTimestamp: Long): Array[Byte] = {
    require(records.nonEmpty, "a record batch holds ≥1 record")
    val recordsBytes = records.map(_.length).sum
    // everything after the crc field: attributes..records
    val afterCrc = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 +
      recordsBytes).order(ByteOrder.BIG_ENDIAN)
    afterCrc.putShort(0)                       // attributes
    afterCrc.putInt(records.size - 1)          // lastOffsetDelta
    afterCrc.putLong(baseTimestamp)
    afterCrc.putLong(maxTimestamp)
    afterCrc.putLong(-1L)                      // producerId
    afterCrc.putShort(-1)                      // producerEpoch
    afterCrc.putInt(-1)                        // baseSequence
    afterCrc.putInt(records.size)
    records.foreach(r => afterCrc.put(r))
    val tail = afterCrc.array()
    val c = new CRC32C(); c.update(tail, 0, tail.length)
    // batchLength counts everything after itself:
    // partitionLeaderEpoch(4) + magic(1) + crc(4) + tail
    val out = ByteBuffer.allocate(8 + 4 + 4 + 1 + 4 + tail.length)
      .order(ByteOrder.BIG_ENDIAN)
    out.putLong(0L)                            // baseOffset
    out.putInt(4 + 1 + 4 + tail.length)        // batchLength
    out.putInt(-1)                             // partitionLeaderEpoch
    out.put(2.toByte)                          // magic v2
    out.putInt(c.getValue.toInt)               // crc32c, stored unsigned
    out.put(tail)
    out.array()
  }

  /** Frame every row of a wire frame (`key`/`value` binary columns, as
    * [[AvroCodec.toAvroWire]] emits, plus its optional `headers`) into
    * v2 record batches of at most `recordsPerBatch` records, grouped
    * within each partition — the producer's own batching model. Returns
    * one row per batch: `batch` (the full wire bytes), `n_records`,
    * `batch_len`.
    */
  def toBatches(df: DataFrame, recordsPerBatch: Int = 500,
                keyCol: String = "key", valueCol: String = "value",
                timestamp: Long = 0L): DataFrame = {
    require(recordsPerBatch > 0, "recordsPerBatch must be positive")
    val ki = df.schema.fieldIndex(keyCol)
    val vi = df.schema.fieldIndex(valueCol)
    val hi = df.schema.fieldNames.indexOf("headers")
    val outSchema = StructType(Seq(
      StructField("batch", BinaryType),
      StructField("n_records", IntegerType),
      StructField("batch_len", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(recordsPerBatch).map { group =>
        val recs = group.zipWithIndex.map { case (row, i) =>
          val headers: Seq[(String, Array[Byte])] =
            if (hi < 0 || row.isNullAt(hi)) Nil
            else row.getAs[scala.collection.Seq[Row]](hi).toSeq
              .map(h => (h.getAs[String](0), h.getAs[Array[Byte]](1)))
          record(0L, i, row.getAs[Array[Byte]](ki),
            row.getAs[Array[Byte]](vi), headers)
        }
        val b = batch(recs, timestamp, timestamp)
        Row(b, recs.size, b.length.toLong)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** One batch PER RECORD, carrying `keep` columns through — the
    * oracle-able shape (q143): each input row maps to exactly one
    * batch whose length is pure framing arithmetic over that row's key
    * and value byte lengths.
    */
  def perRecordBatches(df: DataFrame, keep: Seq[String],
                       keyCol: String = "key", valueCol: String = "value",
                       timestamp: Long = 0L): DataFrame = {
    val ki = df.schema.fieldIndex(keyCol)
    val vi = df.schema.fieldIndex(valueCol)
    val keepIdx = keep.map(df.schema.fieldIndex)
    val outSchema = StructType(
      keep.map(df.schema(_)) :+ StructField("batch_len", LongType))
    df.mapPartitions { rows =>
      rows.map { row =>
        val b = batch(Seq(record(0L, 0, row.getAs[Array[Byte]](ki),
          row.getAs[Array[Byte]](vi), Nil)), timestamp, timestamp)
        Row.fromSeq(keepIdx.map(row.get) :+ b.length.toLong)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  // ---------------------------------------------------------------------
  // FETCH side — parse v2 batches back to records (the consumer half of
  // the wire contract, symmetric to toBatches). A broker hands a FETCH
  // response as raw record-batch bytes; the consumer must verify the
  // CRC, reject torn (truncated / over-long) batches, and re-derive
  // per-record offsets and timestamps from the batch base + deltas.
  // ---------------------------------------------------------------------

  /** One consumer-visible record parsed out of a v2 batch. */
  private[graft] final case class ParsedRecord(
      offset: Long, timestamp: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])])

  /** Parse ONE v2 record batch, verifying every framing invariant the
    * protocol lets a consumer check:
    *
    *  - the array holds exactly `12 + batchLength` bytes (a shorter
    *    array is a TORN batch — a fetch cut mid-transfer; a longer one
    *    has trailing garbage),
    *  - `magic == 2` (this parser speaks only the v2 layout),
    *  - stored CRC32C equals the CRC recomputed over everything after
    *    the crc field (bit rot / torn writes),
    *  - compression bits are 0 (this producer never compresses; a
    *    compressed batch from elsewhere must fail loudly, not parse
    *    garbage),
    *  - each record's varint `length` is consumed exactly, the declared
    *    `recordsCount` of records fill the batch exactly, and the last
    *    record's offsetDelta equals the header's `lastOffsetDelta`.
    *
    * Returns consumer-view records with absolute offsets
    * (`baseOffset + offsetDelta`) and timestamps
    * (`baseTimestamp + timestampDelta`).
    */
  private[graft] def parseBatch(bytes: Array[Byte]): Seq[ParsedRecord] = {
    require(bytes.length >= BatchHeaderBytes,
      s"torn batch: ${bytes.length} bytes < $BatchHeaderBytes-byte header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val baseOffset = bb.getLong(0)
    val batchLength = bb.getInt(8)
    require(12 + batchLength == bytes.length,
      s"torn batch: declared ${12 + batchLength} bytes, got ${bytes.length}")
    val magic = bytes(16)
    require(magic == 2, s"unsupported magic $magic (v2 parser)")
    val crcStored = bb.getInt(17)
    val c = new CRC32C(); c.update(bytes, 21, bytes.length - 21)
    require(crcStored == c.getValue.toInt,
      f"crc32c mismatch: stored 0x$crcStored%08x, computed 0x${c.getValue.toInt}%08x")
    val attributes = bb.getShort(21)
    require((attributes & 0x7) == 0,
      s"compressed batch (attributes codec ${attributes & 0x7}) not supported")
    val lastOffsetDelta = bb.getInt(23)
    val baseTimestamp = bb.getLong(27)
    val recordsCount = bb.getInt(57)
    require(recordsCount >= 1, s"empty batch (recordsCount $recordsCount)")

    var p = BatchHeaderBytes
    def zigzag(): Long = {
      var shift = 0; var v = 0L
      while ({
        require(p < bytes.length, "record varint runs past batch end")
        val b = bytes(p); p += 1
        v |= (b & 0x7fL) << shift; shift += 7
        require(shift <= 70, "malformed record varint: more than 10 bytes")
        (b & 0x80) != 0
      }) ()
      (v >>> 1) ^ -(v & 1)
    }
    def sized(n: Int): Array[Byte] = {
      require(n >= 0 && p + n <= bytes.length,
        s"record field of $n bytes overruns batch end")
      val out = java.util.Arrays.copyOfRange(bytes, p, p + n); p += n; out
    }
    val records = (0 until recordsCount).map { i =>
      val len = zigzag().toInt
      val start = p
      require(len >= 0 && start + len <= bytes.length,
        s"record $i declares $len bytes, overruns batch end")
      require(p < bytes.length, "record truncated before attributes")
      p += 1 // record attributes: unused
      val tsDelta = zigzag()
      val offDelta = zigzag()
      val keyLen = zigzag().toInt
      val key = if (keyLen < 0) null else sized(keyLen)
      val valLen = zigzag().toInt
      val value = if (valLen < 0) null else sized(valLen)
      val headerCount = zigzag().toInt
      require(headerCount >= 0, s"negative header count $headerCount")
      val headers = (0 until headerCount).map { _ =>
        val hk = new String(sized(zigzag().toInt), "UTF-8")
        val hvLen = zigzag().toInt
        (hk, if (hvLen < 0) null else sized(hvLen))
      }
      require(p == start + len,
        s"record $i framing: declared $len bytes, consumed ${p - start}")
      if (i == recordsCount - 1)
        require(offDelta == lastOffsetDelta.toLong,
          s"lastOffsetDelta $lastOffsetDelta != final record delta $offDelta")
      ParsedRecord(baseOffset + offDelta, baseTimestamp + tsDelta,
        key, value, headers)
    }
    require(p == bytes.length,
      s"${bytes.length - p} trailing bytes after the last record")
    records
  }

  /** Explode a frame of v2 record batches (`batchCol` binary) back into
    * consumer records: `keep` columns carried through, then `offset`,
    * `timestamp`, `key`, `value`, `headers` — the inverse of
    * [[toBatches]] and the exact frame [[AvroCodec.fromAvroWire]]
    * consumes. CRC and framing are verified per batch; a torn or
    * corrupted batch throws (at-least-once consumers re-fetch, they do
    * not skip silently).
    *
    * Scale shape: row-local `mapPartitions` (one batch in, its records
    * out), no shuffle — the consumer-side mirror of the producer's
    * batching pass.
    */
  def fromBatches(df: DataFrame, batchCol: String = "batch",
                  keep: Seq[String] = Nil): DataFrame = {
    val bi = df.schema.fieldIndex(batchCol)
    val keepIdx = keep.map(df.schema.fieldIndex)
    val outSchema = StructType(keep.map(df.schema(_)) ++ Seq(
      StructField("offset", LongType),
      StructField("timestamp", LongType),
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("headers", ArrayType(StructType(Seq(
        StructField("key", StringType),
        StructField("value", BinaryType)))))))
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val kept = keepIdx.map(row.get)
        parseBatch(row.getAs[Array[Byte]](bi)).map { r =>
          Row.fromSeq(kept ++ Seq(r.offset, r.timestamp, r.key, r.value,
            r.headers.map(h => Row(h._1, h._2))))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
