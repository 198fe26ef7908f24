package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

import graft.functions.{AvroCodec, KafkaWire}
import org.apache.spark.sql.functions._

/** Byte-level contract of the Kafka v2 record-batch framing (VERDICT
  * r9 #3): a HAND-BUILT expected batch — every field placed by the
  * published layout, CRC32C computed independently over the hand-built
  * tail — compared byte-for-byte against the encoder, plus the framing
  * rules (zigzag varints, null-key −1, offset deltas, batch grouping)
  * and the integration the connector would provide: v2 batches around
  * [[AvroCodec]] payloads, decodable back to the original rows by a
  * spec-local parser written from the spec text, not from the encoder.
  */
class KafkaWireSpec extends SparkSpec {
  import spark.implicits._

  test("single-record batch matches the hand-built v2 layout, CRC32C " +
    "computed independently") {
    val df = Seq((Array[Byte]('k'), Array[Byte]('v', 'a', 'l')))
      .toDF("key", "value")
    val got = KafkaWire.toBatches(df, recordsPerBatch = 10)
      .collect().head.getAs[Array[Byte]]("batch")

    // record body, field by field per the published Record layout
    val body = Array[Byte](
      0x00,             // record attributes
      0x00,             // timestampDelta 0 (zigzag)
      0x00,             // offsetDelta 0
      0x02, 'k',        // keyLength 1 (zigzag 2) + key
      0x06, 'v', 'a', 'l', // valueLength 3 (zigzag 6) + value
      0x00)             // headers count 0
    val record = Array[Byte]((body.length * 2).toByte) ++ body // zigzag len
    // tail = everything after the crc field
    val tail = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 +
      record.length).order(ByteOrder.BIG_ENDIAN)
      .putShort(0)        // attributes: no compression, CREATE_TIME
      .putInt(0)          // lastOffsetDelta
      .putLong(0L)        // baseTimestamp
      .putLong(0L)        // maxTimestamp
      .putLong(-1L)       // producerId
      .putShort(-1)       // producerEpoch
      .putInt(-1)         // baseSequence
      .putInt(1)          // recordsCount
      .put(record).array()
    val crc = new CRC32C()
    crc.update(tail, 0, tail.length)
    val expected = ByteBuffer.allocate(8 + 4 + 4 + 1 + 4 + tail.length)
      .order(ByteOrder.BIG_ENDIAN)
      .putLong(0L)                    // baseOffset (broker reassigns)
      .putInt(4 + 1 + 4 + tail.length) // batchLength
      .putInt(-1)                     // partitionLeaderEpoch
      .put(2.toByte)                  // magic v2
      .putInt(crc.getValue.toInt)     // crc32c over the tail
      .put(tail).array()
    assert(got.length == KafkaWire.BatchHeaderBytes + record.length)
    assert(got.toSeq == expected.toSeq,
      s"got ${got.map("%02x".format(_)).mkString(" ")}")
  }

  test("null key encodes as varint length −1; headers frame key/value") {
    val df = Seq((Option.empty[Array[Byte]], Array[Byte](0x7f)))
      .toDF("key", "value")
    val withHeaders = AvroCodec.toAvroWire(
      Seq((1L, "x")).toDF("id", "s"), Seq("id"),
      headers = Map("src" -> "7"))
    val b1 = KafkaWire.toBatches(df).collect().head
      .getAs[Array[Byte]]("batch")
    // record: len attrs ts off keyLen(-1 → zigzag 1) valLen(1 → 2) val hc
    val rec = b1.drop(KafkaWire.BatchHeaderBytes)
    assert(rec.toSeq == Seq[Byte](0x0e, 0x00, 0x00, 0x00, 0x01, 0x02,
      0x7f, 0x00))
    // headers ride through toBatches from AvroCodec's headers column
    val b2 = KafkaWire.toBatches(withHeaders).collect().head
      .getAs[Array[Byte]]("batch")
    val tail2 = b2.drop(KafkaWire.BatchHeaderBytes)
    // the record's last 9 bytes: headersCount=1 (0x02), keyLen=3 (0x06)
    // 's''r''c', valLen=1 (0x02) '7'
    assert(tail2.takeRight(7).toSeq ==
      Seq[Byte](0x02, 0x06, 's', 'r', 'c', 0x02, '7'.toByte))
  }

  test("batch grouping: offset deltas, lastOffsetDelta, recordsCount, " +
    "one batch per recordsPerBatch within a partition") {
    val df = (0 until 7).map(i => (Array[Byte](i.toByte), Array[Byte](i.toByte)))
      .toDF("key", "value").coalesce(1)
    val batches = KafkaWire.toBatches(df, recordsPerBatch = 3).collect()
    assert(batches.map(_.getAs[Int]("n_records")).toSeq == Seq(3, 3, 1))
    val first = batches.head.getAs[Array[Byte]]("batch")
    val bb = ByteBuffer.wrap(first).order(ByteOrder.BIG_ENDIAN)
    assert(bb.getLong(0) == 0L)                     // baseOffset
    assert(first(16) == 2.toByte)                   // magic
    assert(bb.getInt(23) == 2)                      // lastOffsetDelta
    assert(bb.getInt(57) == 3)                      // recordsCount
    // third record's offsetDelta is 2: parse forward over the records
    var p = KafkaWire.BatchHeaderBytes
    def zig(): Long = { // spec-local zigzag varint reader
      var shift = 0; var v = 0L
      while ({ val b = first(p); p += 1
        v |= (b & 0x7fL) << shift; shift += 7; (b & 0x80) != 0 }) ()
      (v >>> 1) ^ -(v & 1)
    }
    (0 until 3).foreach { i =>
      val len = zig(); val start = p
      p += 1 // attributes
      assert(zig() == 0L)      // timestampDelta
      assert(zig() == i.toLong, "offsetDelta must count within the batch")
      p = start + len.toInt
    }
    assert(p == first.length, "records must fill the batch exactly")
  }

  test("v2 batches around AvroCodec payloads decode back to the rows " +
    "the connector would deliver") {
    val rows = Seq((1L, 2.5, "ab"), (2L, -0.5, "xyz"))
    val wire = AvroCodec.toAvroWire(rows.toDF("id", "score", "name"),
      Seq("id")).coalesce(1)
    val batch = KafkaWire.toBatches(wire, recordsPerBatch = 10)
      .collect().head.getAs[Array[Byte]]("batch")
    // spec-local parser, written from the published layout
    val bb = ByteBuffer.wrap(batch).order(ByteOrder.BIG_ENDIAN)
    val count = bb.getInt(57)
    assert(count == 2)
    // crc check first: recompute over the tail
    val crcStored = bb.getInt(17)
    val c = new CRC32C(); c.update(batch, 21, batch.length - 21)
    assert(crcStored == c.getValue.toInt, "crc32c must cover the tail")
    var p = KafkaWire.BatchHeaderBytes
    def zig(): Long = {
      var shift = 0; var v = 0L
      while ({ val b = batch(p); p += 1
        v |= (b & 0x7fL) << shift; shift += 7; (b & 0x80) != 0 }) ()
      (v >>> 1) ^ -(v & 1)
    }
    val values = (0 until count).map { _ =>
      zig(); p += 1; zig(); zig() // len, attrs, tsDelta, offsetDelta
      val kl = zig().toInt; p += math.max(kl, 0)
      val vl = zig().toInt
      val v = java.util.Arrays.copyOfRange(batch, p, p + vl); p += vl
      val hc = zig().toInt; assert(hc == 0); v
    }
    val back = AvroCodec.fromAvroWire(
      values.map(Tuple1(_)).toDF("value"),
      rows.toDF("id", "score", "name").schema)
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(back == rows)
  }

  // ------------------------------------------------------------------
  // FETCH side (r11): fromBatches is the wire-symmetric consumer half.
  // ------------------------------------------------------------------

  test("fromBatches parses a HAND-BUILT batch (layout-only, not the " +
    "encoder's output): offsets, timestamps, key/value/header bytes") {
    // two records, base timestamp 1000, hand-framed per the spec text
    def rec(off: Int, ts: Int, key: Array[Byte], value: Array[Byte],
            headers: Seq[(String, Array[Byte])]): Array[Byte] = {
      def zz(v: Long): Array[Byte] = {
        var x = (v << 1) ^ (v >> 63); val b = Array.newBuilder[Byte]
        while ((x & ~0x7fL) != 0) { b += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
        (b += x.toByte).result()
      }
      val body = Array[Byte](0x00) ++ zz(ts.toLong) ++ zz(off.toLong) ++
        (if (key == null) zz(-1L) else zz(key.length.toLong) ++ key) ++
        (if (value == null) zz(-1L) else zz(value.length.toLong) ++ value) ++
        zz(headers.size.toLong) ++ headers.flatMap { case (k, v) =>
          val kb = k.getBytes("UTF-8")
          zz(kb.length.toLong) ++ kb ++
            (if (v == null) zz(-1L) else zz(v.length.toLong) ++ v)
        }
      zz(body.length.toLong) ++ body
    }
    val r0 = rec(0, 0, Array[Byte]('a'), Array[Byte]('p', 'q'),
      Seq(("h1", Array[Byte]('z'))))
    val r1 = rec(1, 5, null, Array[Byte]('r'), Nil)
    val tail = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 +
      r0.length + r1.length).order(ByteOrder.BIG_ENDIAN)
      .putShort(0).putInt(1)          // attrs, lastOffsetDelta
      .putLong(1000L).putLong(1005L)  // base/max timestamp
      .putLong(-1L).putShort(-1).putInt(-1)
      .putInt(2).put(r0).put(r1).array()
    val crc = new CRC32C(); crc.update(tail, 0, tail.length)
    val batch = ByteBuffer.allocate(8 + 4 + 4 + 1 + 4 + tail.length)
      .order(ByteOrder.BIG_ENDIAN)
      .putLong(42L)                   // broker-assigned baseOffset
      .putInt(4 + 1 + 4 + tail.length).putInt(-1)
      .put(2.toByte).putInt(crc.getValue.toInt).put(tail).array()

    val out = KafkaWire.fromBatches(Seq(Tuple1(batch)).toDF("batch"))
      .orderBy("offset").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("offset") == 42L &&
      out(0).getAs[Long]("timestamp") == 1000L)
    assert(out(0).getAs[Array[Byte]]("key").toSeq == Seq[Byte]('a'))
    assert(out(0).getAs[Array[Byte]]("value").toSeq == Seq[Byte]('p', 'q'))
    val hdrs = out(0).getAs[scala.collection.Seq[
      org.apache.spark.sql.Row]]("headers")
    assert(hdrs.length == 1 && hdrs.head.getString(0) == "h1" &&
      hdrs.head.getAs[Array[Byte]](1).toSeq == Seq[Byte]('z'))
    assert(out(1).getAs[Long]("offset") == 43L &&
      out(1).getAs[Long]("timestamp") == 1005L)
    assert(out(1).getAs[Array[Byte]]("key") == null)
    assert(out(1).getAs[Array[Byte]]("value").toSeq == Seq[Byte]('r'))
  }

  test("toBatches → fromBatches round-trips key/value/header bytes, " +
    "derives offsets within each batch, and keeps batch timestamps") {
    val wire = AvroCodec.toAvroWire(
      (1L to 7L).map(i => (i, s"n$i")).toDF("id", "name"), Seq("id"),
      headers = Map("subject" -> "t1")).coalesce(1)
    val batches = KafkaWire.toBatches(wire, recordsPerBatch = 3,
      timestamp = 777L)
    val back = KafkaWire.fromBatches(batches)
    assert(back.count() == 7)
    assert(back.where(col("timestamp") =!= 777L).count() == 0)
    // offsets restart per producer batch (baseOffset 0 pre-append)
    assert(back.groupBy().agg(max(col("offset"))).collect()
      .head.getLong(0) == 2L)
    val decoded = AvroCodec.fromAvroWire(back,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("name",
            org.apache.spark.sql.types.StringType))))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(decoded.toSeq == (1L to 7L).map(i => (i, s"n$i")))
    val hdr = back.select(explode(col("headers")).as("h")).select("h.*")
      .collect().head
    assert(hdr.getString(0) == "subject" &&
      new String(hdr.getAs[Array[Byte]](1), "UTF-8") == "t1")
  }

  test("fromBatches rejects corruption: flipped payload byte (crc), " +
    "truncation (torn), trailing bytes, and compressed attributes") {
    val df = Seq((Array[Byte]('k'), Array[Byte]('v'))).toDF("key", "value")
    val good = KafkaWire.toBatches(df).collect().head
      .getAs[Array[Byte]]("batch")
    def parse(b: Array[Byte]) =
      KafkaWire.fromBatches(Seq(Tuple1(b)).toDF("batch")).collect()
    assert(parse(good).length == 1)

    val flipped = good.clone()
    flipped(good.length - 1) = (flipped(good.length - 1) ^ 0x01).toByte
    val e1 = intercept[org.apache.spark.SparkException](parse(flipped))
    assert(e1.getCause.getMessage.contains("crc32c"))

    val torn = java.util.Arrays.copyOf(good, good.length - 3)
    val e2 = intercept[org.apache.spark.SparkException](parse(torn))
    assert(e2.getCause.getMessage.contains("torn"))

    val trailing = good ++ Array[Byte](0x00)
    val e3 = intercept[org.apache.spark.SparkException](parse(trailing))
    assert(e3.getCause.getMessage.contains("torn"))

    // set a compression codec bit and re-stamp the crc so ONLY the
    // codec check can fire
    val gz = good.clone()
    gz(22) = (gz(22) | 0x01).toByte // attributes low byte (big-endian)
    val c = new CRC32C(); c.update(gz, 21, gz.length - 21)
    ByteBuffer.wrap(gz).order(ByteOrder.BIG_ENDIAN)
      .putInt(17, c.getValue.toInt)
    val e4 = intercept[org.apache.spark.SparkException](parse(gz))
    assert(e4.getCause.getMessage.contains("compressed"))
  }
}
