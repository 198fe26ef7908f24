package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus distributed decode / feature-extract plumbing.
  *
  * The decode kernels are STUBBED with a deterministic fake (this container
  * has no image/audio codecs); everything around them — schema contract,
  * batched per-partition execution, output shapes — is real. In production
  * the `decodeBatch` body is replaced by an actual codec call; the Spark
  * plan is unchanged.
  *
  * Scale notes: decode runs via `mapPartitions` (one JVM-side pass per
  * partition, no per-row task overhead, analogous to the reference's
  * `mapInPandas` batching); binary payloads never shuffle — feature
  * extraction happens before any wide transformation, and downstream ops
  * see only the small fixed-width feature columns.
  */
object Multimodal {

  /** Metadata struct carried alongside every media column. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType)))

  /** Wrap a binary column with its metadata struct (pure expressions). */
  def withMediaMeta(df: DataFrame, binaryCol: String,
                    mediaType: String): DataFrame =
    df.withColumn(s"${binaryCol}_meta", struct(
      lit(mediaType).as("media_type"),
      length(col(binaryCol)).cast("long").as("n_bytes"),
      xxhash64(col(binaryCol)).as("checksum")))

  /** STUB decode kernel: deterministic fake "embedding" derived from the
    * bytes (splittable hash per lane). Replace with a real codec (JPEG
    * decode, mel spectrogram, frame sampling) in production — signature
    * stays `Array[Byte] => Array[Float]`.
    */
  private def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic seed
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      val x = h * (d * 2654435761L + 1)
      out(d) = ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat
      d += 1
    }
    out
  }

  /** Distributed feature extraction over a binary media column: batched
    * per-partition decode → fixed-width `array<float>` feature column.
    */
  def extractFeatures(df: DataFrame, binaryCol: String,
                      dim: Int = 16): DataFrame = {
    val outSchema = df.schema.add(s"${binaryCol}_features",
      ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val feats =
          if (bytes == null) new Array[Float](dim) else fakeDecode(bytes, dim)
        Row.fromSeq(row.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame-sample plumbing for video-like payloads: emit `n` strided slices
    * of the payload as one row each (the real kernel would decode frames).
    * Pure expressions: posexplode over computed slice offsets.
    */
  def sampleFrames(df: DataFrame, binaryCol: String, n: Int): DataFrame = {
    val sz = length(col(binaryCol))
    val offsets = transform(sequence(lit(0), lit(n - 1)),
      i => (i * sz / n).cast("int"))
    df.select(df.columns.toIndexedSeq.map(col) :+
        posexplode(offsets).as(Seq("frame_idx", "_off")): _*)
      .withColumn("frame_bytes",
        col(binaryCol).substr(col("_off") + 1, lit(64)))
      .drop("_off")
  }
}
