package graft

import graft.functions.AvroCodec
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.apache.avro.util.Utf8
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-level contract of the binary-Avro wire codec: hand-computed
  * expected bytes (the spec-defined zigzag/union/length layout), parity
  * with stock Avro's own encoder over the same schema JSON, and the
  * decode round trip — the verification JSON-shape parity could never
  * give (VERDICT r8 #4).
  */
class AvroCodecSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("score", DoubleType),
    StructField("name", StringType)))

  test("value bytes match the hand-computed binary-Avro layout") {
    val df = Seq((1L, 2.5, "ab")).toDF("id", "score", "name")
    val wire = AvroCodec.toAvroWire(df, Seq("id")).collect().head
    val value = wire.getAs[Array[Byte]]("value")
    // field id: union branch 1 (zigzag 2) + long 1 (zigzag 2)
    // field score: union branch 1 + 8 little-endian IEEE-754 bytes of 2.5
    // field name: union branch 1 + length 2 (zigzag 4) + 'a' 'b'
    val le = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(2.5).array()
    val expected = Array[Byte](0x02, 0x02, 0x02) ++ le ++
      Array[Byte](0x02, 0x04, 'a'.toByte, 'b'.toByte)
    assert(value.toSeq == expected.toSeq,
      s"got ${value.map("%02x".format(_)).mkString(" ")}")
    // key: nullable-union string of "1" → branch 1 (zigzag 2) +
    // length 1 (zigzag 2) + '1'
    val key = wire.getAs[Array[Byte]]("key")
    assert(key.toSeq == Seq[Byte](0x02, 0x02, '1'.toByte))
  }

  test("a null pk component nulls the whole key (concat semantics)") {
    def key(part: Option[String], n: Long): Seq[Byte] =
      AvroCodec.toAvroWire(Seq((part, n)).toDF("part", "n"),
        Seq("part", "n")).collect().head.getAs[Array[Byte]]("key").toSeq
    // null component → null concat → union branch 0, one byte
    assert(key(None, 1L) == Seq[Byte](0x00))
    // sorted pk (n, part) → "2a" under branch 1
    assert(key(Some("a"), 2L) ==
      Seq[Byte](0x02, 0x04, '2'.toByte, 'a'.toByte))
  }

  test("null fields encode as the 1-byte null union branch") {
    val df = Seq((7L, Option.empty[Double], Option.empty[String]))
      .toDF("id", "score", "name")
    val value = AvroCodec.toAvroWire(df, Seq("id")).collect().head
      .getAs[Array[Byte]]("value")
    // id: 0x02 0x0e (zigzag 14); score: 0x00; name: 0x00
    assert(value.toSeq == Seq[Byte](0x02, 0x0e, 0x00, 0x00))
  }

  test("bytes are identical to stock Avro encoding the same record") {
    val rows = Seq((42L, 3.75, "hello"), (-3L, -0.5, ""),
      (1234567L, 0.0, "κλμ"))
    val df = rows.toDF("id", "score", "name")
    val ours = AvroCodec.toAvroWire(df, Seq("id"))
      .select("value").collect().map(_.getAs[Array[Byte]](0).toSeq).toSet
    val avroSchema =
      new Schema.Parser().parse(AvroCodec.avroSchemaJson(schema, "t"))
    val writer = new GenericDatumWriter[GenericData.Record](avroSchema)
    val reference = rows.map { case (id, score, name) =>
      val rec = new GenericData.Record(avroSchema)
      rec.put(0, java.lang.Long.valueOf(id))
      rec.put(1, java.lang.Double.valueOf(score))
      rec.put(2, new Utf8(name))
      val buf = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(buf, null)
      writer.write(rec, enc); enc.flush()
      buf.toByteArray.toSeq
    }.toSet
    assert(ours == reference)
  }

  test("wire round trip: decode(encode(df)) == df, including nulls") {
    val df = Seq(
      (1L, Some(2.5), Some("ab")),
      (2L, None, Some("x")),
      (3L, Some(-1.25), None))
      .toDF("id", "score", "name")
    val wired = AvroCodec.toAvroWire(df, Seq("id"),
      headers = Map("projectId" -> "7"))
    assert(wired.columns.toSeq == Seq("key", "value", "headers"))
    val back = AvroCodec.fromAvroWire(wired, df.schema)
      .orderBy("id").collect()
    val orig = df.orderBy("id").collect()
    assert(back.toSeq == orig.toSeq)
  }

  test("decimal encodes as logical-decimal bytes: big-endian " +
    "two's-complement unscaled value, hand-computed") {
    val df = Seq((1L, new java.math.BigDecimal("123.45")))
      .toDF("id", "price")
      .select(col("id"), col("price").cast("decimal(6,2)").as("price"))
    val wire = AvroCodec.toAvroWire(df, Seq("id")).collect().head
    val value = wire.getAs[Array[Byte]]("value")
    // id: branch 0x02 + zigzag(1)=0x02; price: branch 0x02 +
    // bytes-length 2 (zigzag 4) + unscaled 12345 = 0x3039 big-endian
    assert(value.toSeq ==
      Seq[Byte](0x02, 0x02, 0x02, 0x04, 0x30, 0x39))
    // schema JSON carries the logical type with precision/scale
    val json = AvroCodec.avroSchemaJson(df.schema, "t")
    assert(json.contains(""""logicalType":"decimal"""") &&
      json.contains(""""precision":6""") && json.contains(""""scale":2"""))
    // negative unscaled values keep two's complement: -0.01 → -1 → 0xff
    val neg = Seq((2L, new java.math.BigDecimal("-0.01"))).toDF("id", "price")
      .select(col("id"), col("price").cast("decimal(6,2)").as("price"))
    val nb = AvroCodec.toAvroWire(neg, Seq("id")).collect().head
      .getAs[Array[Byte]]("value")
    assert(nb.toSeq == Seq[Byte](0x02, 0x04, 0x02, 0x02, 0xff.toByte))
    // round trip preserves the exact decimal
    val back = AvroCodec.fromAvroWire(
      AvroCodec.toAvroWire(df, Seq("id")), df.schema).collect().head
    assert(back.getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("123.45")) == 0)
  }

  test("array-of-primitive encodes as avro blocks, hand-computed") {
    val df = Seq((1L, Seq(1L, 2L))).toDF("id", "xs")
    val wire = AvroCodec.toAvroWire(df, Seq("id")).collect().head
    val value = wire.getAs[Array[Byte]]("value")
    val json = AvroCodec.avroSchemaJson(df.schema, "t")
    // Spark's Seq[Long] encoder declares containsNull=false → plain items
    assert(json.contains(""""type":"array","items":"long""""))
    // id: 0x02 0x02; xs: branch 0x02 + block count 2 (zigzag 4) +
    // zigzag(1) zigzag(2) + end-of-blocks 0x00
    assert(value.toSeq ==
      Seq[Byte](0x02, 0x02, 0x02, 0x04, 0x02, 0x04, 0x00))
    // nullable elements get the per-item union: branch bytes interleave
    val dfN = Seq((1L, Seq(Some(3L), None))).toDF("id", "xs")
    val jsonN = AvroCodec.avroSchemaJson(dfN.schema, "t")
    assert(jsonN.contains(""""items":["null","long"]"""))
    val vN = AvroCodec.toAvroWire(dfN, Seq("id")).collect().head
      .getAs[Array[Byte]]("value")
    // xs: branch 0x02 + count 0x04 + [item branch 0x02, zigzag(3)=0x06]
    // + [item branch 0x00] + end 0x00
    assert(vN.toSeq ==
      Seq[Byte](0x02, 0x02, 0x02, 0x04, 0x02, 0x06, 0x00, 0x00))
    // round trip including the null element
    val back = AvroCodec.fromAvroWire(
      AvroCodec.toAvroWire(dfN, Seq("id")), dfN.schema).collect().head
    assert(back.getAs[scala.collection.Seq[Any]]("xs").toSeq ==
      Seq(3L, null))
  }

  test("timestamps round-trip as timestamp-micros logical longs") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")))
      .toDF("id", "ts")
    val back = AvroCodec.fromAvroWire(
      AvroCodec.toAvroWire(df, Seq("id")), df.schema).collect().head
    assert(back.getAs[java.sql.Timestamp]("ts") ==
      java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456"))
  }

  test("undecodable payloads surface as all-null rows, not exceptions") {
    val junk = Seq(Tuple1(Array[Byte](0x02, 0x7f, 0x7f))).toDF("value")
    val out = AvroCodec.fromAvroWire(junk, schema).collect()
    assert(out.length == 1 && (0 until 3).forall(out.head.isNullAt))
  }

  test("keepCols carry consumer metadata through the decode") {
    val df = Seq((5L, 1.0, "z")).toDF("id", "score", "name")
    val wired = AvroCodec.toAvroWire(df, Seq("id"))
      .withColumn("offset", lit(99L))
    val out = AvroCodec.fromAvroWire(wired, df.schema,
      keepCols = Seq("offset")).collect().head
    assert(out.getAs[Long]("offset") == 99L && out.getAs[Long]("id") == 5L)
  }
}
