package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus distributed decode / feature-extract kernels.
  *
  * The image decode is REAL: `javax.imageio` ships in the JDK (PNG/BMP/GIF
  * and whatever other readers the JRE registers), so no external codec jar
  * is needed. Payloads that no registered reader understands yield null
  * stats / zero embeddings rather than failing the job — a 100 TB corpus
  * always contains undecodable blobs.
  *
  * Scale notes: decode runs via `mapPartitions` (one JVM-side pass per
  * partition, no per-row task overhead, analogous to the reference's
  * `mapInPandas` batching — engine/spark.py embedding/complex-feature
  * path); binary payloads never shuffle — feature extraction happens
  * before any wide transformation, and downstream ops see only the small
  * fixed-width feature columns.
  */
object Multimodal {

  // ImageIO's default scratch-file cache would touch executor-local disk
  // per decode; in-memory streams are strictly better for byte[] payloads
  ImageIO.setUseCache(false)

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

  /** Decoded per-image statistics: dimensions, per-channel pixel-value
    * sums (exact integers — no float parity concerns across engines), and
    * an integer luminance histogram (`(299r + 587g + 114b) / 1000`,
    * bucketed into `lumHist.length` equal slices of 0..255).
    */
  final case class ImageStats(width: Int, height: Int,
                              sumR: Long, sumG: Long, sumB: Long,
                              lumHist: Array[Long])

  /** Real image decode: bytes → stats, None when no registered ImageIO
    * reader accepts the payload.
    */
  def decodeImage(bytes: Array[Byte], lumBuckets: Int = 4): Option[ImageStats] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    // one bulk sRGB grab instead of w*h getRGB calls
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](lumBuckets)
    val bucketWidth = 256 / lumBuckets
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      val r = (p >>> 16) & 0xff
      val g = (p >>> 8) & 0xff
      val b = p & 0xff
      sr += r; sg += g; sb += b
      val lum = (299 * r + 587 * g + 114 * b) / 1000
      hist(math.min(lum / bucketWidth, lumBuckets - 1)) += 1
      i += 1
    }
    Some(ImageStats(w, h, sr, sg, sb, hist))
  }

  /** Distributed image-stat extraction over a binary media column: batched
    * per-partition ImageIO decode → flat integer feature columns
    * (`width/height/sum_r/sum_g/sum_b/lum_h0..h3`, null for undecodable
    * payloads). Integer outputs are exact, so a planted-pixel oracle can
    * verify the decode bit-for-bit.
    */
  def extractImageStats(df: DataFrame, binaryCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType),
      StructField("lum_h0", LongType),
      StructField("lum_h1", LongType),
      StructField("lum_h2", LongType),
      StructField("lum_h3", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        decodeImage(row.getAs[Array[Byte]](idx)) match {
          case Some(s) => Row.fromSeq(row.toSeq ++ Seq[Any](
            s.width, s.height, s.sumR, s.sumG, s.sumB,
            s.lumHist(0), s.lumHist(1), s.lumHist(2), s.lumHist(3)))
          case None => Row.fromSeq(row.toSeq ++ Seq.fill(9)(null))
        }
      }
    }(enc)
  }

  /** Fixed-width float embedding from the REAL decode: `dim`-bucket
    * luminance histogram normalized by pixel count. Undecodable payloads
    * embed as the zero vector (kept, not dropped — callers filter on the
    * metadata/width columns when they want images only).
    */
  def extractFeatures(df: DataFrame, binaryCol: String,
                      dim: Int = 16): DataFrame = {
    val outSchema = df.schema.add(s"${binaryCol}_features",
      ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val feats = decodeImage(row.getAs[Array[Byte]](idx), lumBuckets = dim)
          .map { s =>
            val n = s.width.toLong * s.height
            s.lumHist.map(c => (c.toDouble / n).toFloat)
          }
          .getOrElse(new Array[Float](dim))
        Row.fromSeq(row.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Deterministic planted RGB image, PNG-encoded (lossless, so the decode
    * kernel must recover exactly these pixel values): channel value at
    * (x, y) for image id `d` is
    * {{{
    *   r = (d + 7x + 13y)  mod 256
    *   g = (3d + 5x + 11y) mod 256
    *   b = (5d + 3x + 17y) mod 256
    * }}}
    * — a closed form an independent SQL oracle can evaluate without any
    * image codec.
    */
  def plantedPng(id: Long, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = (((id + 7L * x + 13L * y) % 256) & 0xff).toInt
        val g = (((3L * id + 5L * x + 11L * y) % 256) & 0xff).toInt
        val b = (((5L * id + 3L * x + 17L * y) % 256) & 0xff).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Planted-PNG column for a numeric id column: batched per-partition
    * encode (the inverse of the decode kernel, used to drive it with
    * independently verifiable pixels). Width/height derive from the id so
    * dimensions vary across rows: `w = 4 + id mod 5`, `h = 4 + id mod 3`.
    */
  def withPlantedPng(df: DataFrame, idCol: String,
                     binaryCol: String): DataFrame = {
    val outSchema = df.schema.add(binaryCol, BinaryType)
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idx)
        val png = plantedPng(id, 4 + (id % 5).toInt, 4 + (id % 3).toInt)
        Row.fromSeq(row.toSeq :+ png)
      }
    }(enc)
  }

  /** Nearest-neighbor image resize over PNG/BMP/GIF payloads: decode,
    * resample to `width`×`height` with the EXPLICIT mapping
    * `src = (dst · srcDim) div dstDim` (integer floor), re-encode
    * losslessly as PNG into `outCol`. The pixel loop is hand-rolled
    * rather than `Graphics2D`-interpolated so the output is a pure
    * closed-form function of the input pixels — deterministic across
    * JVMs and independently replayable by a SQL oracle (q94 resizes the
    * planted closed-form image and the oracle recomputes every resized
    * pixel without any codec). Undecodable/null payloads yield a null
    * `outCol` (kept, not dropped — same contract as [[extractFeatures]]).
    *
    * Same scale shape as the decode kernel: the one justified
    * `mapPartitions`, applied before any shuffle so only the (smaller)
    * resized payload ever moves.
    */
  def resizeImage(df: DataFrame, binaryCol: String, outCol: String,
                  width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, "target dimensions must be positive")
    val outSchema = df.schema.add(outCol, BinaryType)
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val out: Array[Byte] =
          if (bytes == null) null
          else try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) null
            else {
              val dst = new BufferedImage(width, height,
                BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < height) {
                val sy = (y.toLong * img.getHeight / height).toInt
                var x = 0
                while (x < width) {
                  val sx = (x.toLong * img.getWidth / width).toInt
                  dst.setRGB(x, y, img.getRGB(sx, sy))
                  x += 1
                }
                y += 1
              }
              val bos = new ByteArrayOutputStream()
              ImageIO.write(dst, "png", bos)
              bos.toByteArray
            }
          } catch { case _: Exception => null }
        Row.fromSeq(row.toSeq :+ out)
      }
    }(enc)
  }

  /** Perceptual average-hash (aHash) over image payloads: decode,
    * nearest-neighbor resample to `side`×`side` (same explicit
    * `src = (dst · srcDim) div dstDim` mapping as [[resizeImage]]),
    * integer grayscale `(r + g + b) div 3` per cell, then one bit per
    * cell — set when `gray · side² ≥ Σ gray` (i.e. at-or-above the mean,
    * in exact integer arithmetic; no float mean). The `side²` bits are
    * emitted as two longs (`<out>_hi` = bits 32..63 for side=8, `<out>_lo`
    * = bits 0..31, row-major bit i at cell (i mod side, i div side)) so a
    * SQL oracle never fights 64-bit sign overflow. Visually identical
    * images — recompressions, format shifts — collide exactly; the
    * Hamming-near variants land one bit apart.
    *
    * Scale shape: the one justified `mapPartitions` (JDK ImageIO decode),
    * applied before any shuffle — downstream dedup groups on two longs,
    * never on pixels. Undecodable/null payloads yield null hash halves
    * (kept, same contract as [[extractFeatures]]).
    */
  def averageHash(df: DataFrame, binaryCol: String, outPrefix: String,
                  side: Int = 8): DataFrame = {
    require(side > 0 && side * side <= 64, "side*side must fit 64 bits")
    val outSchema = df.schema
      .add(s"${outPrefix}_hi", LongType).add(s"${outPrefix}_lo", LongType)
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val hash: Option[(Long, Long)] =
          if (bytes == null) None
          else try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) None
            else {
              val n = side * side
              val gray = new Array[Long](n)
              var sum = 0L
              var i = 0
              while (i < n) {
                val sx = ((i % side).toLong * img.getWidth / side).toInt
                val sy = ((i / side).toLong * img.getHeight / side).toInt
                val rgb = img.getRGB(sx, sy)
                val g = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                  (rgb & 0xff)) / 3
                gray(i) = g
                sum += g
                i += 1
              }
              var hi = 0L; var lo = 0L
              i = 0
              while (i < n) {
                if (gray(i) * n >= sum) {
                  if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
                }
                i += 1
              }
              Some((hi, lo))
            }
          } catch { case _: Exception => None }
        Row.fromSeq(row.toSeq ++ Seq(hash.map(_._1).orNull,
          hash.map(_._2).orNull))
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

  // ----------------------------------------------------------------------
  // Audio: REAL RIFF/WAVE PCM parsing — a WAV file is plain byte
  // arithmetic (chunked RIFF container, little-endian PCM samples), so no
  // codec jar is needed and the decode is exact. Same kernel discipline as
  // images: parse + feature-extract per partition BEFORE any shuffle, so
  // only small fixed-width feature rows ever move.
  // ----------------------------------------------------------------------

  /** Decoded PCM audio: channel-0 samples of a 16-bit PCM WAV. */
  final case class WavData(sampleRate: Int, channels: Int,
                           samples: Array[Int])

  /** Real WAV decode: RIFF/WAVE container walk (fmt + data chunks, odd
    * sizes padded per spec), 16-bit PCM only; returns channel 0. None for
    * null/truncated/non-WAV/compressed payloads — a corpus-scale decode
    * never throws on a bad blob.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavData] = {
    if (bytes == null || bytes.length < 44) return None
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xff).toLong |
      ((bytes(o + 1) & 0xff).toLong << 8) |
      ((bytes(o + 2) & 0xff).toLong << 16) |
      ((bytes(o + 3) & 0xff).toLong << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (audioFormat, channels, rate)
    var bits = 0
    var data: Option[(Int, Int)] = None // (offset, size)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val size = u32(off + 4).toInt
      if (size < 0 || off + 8 + size > bytes.length) return None
      if (id == "fmt " && size >= 16) {
        fmt = Some((u16(off + 8), u16(off + 10), u32(off + 12).toInt))
        bits = u16(off + 22)
      } else if (id == "data") data = Some((off + 8, size))
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, ch, rate)), Some((dOff, dSize)))
          if bits == 16 && ch >= 1 =>
        val blockAlign = 2 * ch
        val nFrames = dSize / blockAlign
        val out = new Array[Int](nFrames)
        var i = 0
        while (i < nFrames) {
          val o = dOff + i * blockAlign // channel 0 leads each frame
          out(i) = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
          i += 1
        }
        Some(WavData(rate, ch, out))
      case _ => None
    }
  }

  /** Per-FRAME audio features over a WAV binary column: the audio analog
    * of image frame-sampling — each complete non-overlapping `frameLen`-
    * sample frame emits one row with integer-exact energy (`sum x²`),
    * magnitude (`sum |x|`) and frame-local zero-crossing count, plus the
    * parsed header fields (`sample_rate`, `n_samples`) that witness the
    * container walk. Undecodable payloads emit zero rows (filtered, like
    * a corrupt image); the trailing partial frame is dropped.
    */
  def audioFrameFeatures(df: DataFrame, binaryCol: String,
                         frameLen: Int): DataFrame = {
    require(frameLen > 0, "frameLen must be positive")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_sum_sq", LongType),
      StructField("frame_sum_abs", LongType),
      StructField("frame_zc", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        decodeWav(row.getAs[Array[Byte]](idx)).iterator.flatMap { wav =>
          val s = wav.samples
          (0 until s.length / frameLen).iterator.map { f =>
            var sq = 0L; var ab = 0L; var zc = 0L
            var i = f * frameLen
            val end = i + frameLen
            while (i < end) {
              val v = s(i).toLong
              sq += v * v; ab += math.abs(v)
              if (i > f * frameLen && (s(i - 1) < 0) != (s(i) < 0)) zc += 1
              i += 1
            }
            Row.fromSeq(row.toSeq ++ Seq[Any](
              wav.sampleRate, s.length.toLong, f, sq, ab, zc))
          }
        }
      }
    }(enc)
  }

  /** Deterministic planted 16-bit mono PCM WAV for a numeric id: sample
    * `i` is `((id·31 + i·7) mod 4096) − 2048`, `n = 64 + id mod 97`
    * samples at 8 kHz — a closed form a SQL oracle evaluates with no
    * codec, byte-assembled through the same RIFF layout [[decodeWav]]
    * parses.
    */
  def plantedWav(id: Long): Array[Byte] = {
    val n = 64 + (id % 97).toInt
    val rate = 8000
    val bos = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    def wtag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    wtag("RIFF"); w32(36 + n * 2); wtag("WAVE")
    wtag("fmt "); w32(16); w16(1); w16(1); w32(rate); w32(rate * 2); w16(2); w16(16)
    wtag("data"); w32(n * 2)
    var i = 0
    while (i < n) {
      w16((((id * 31 + i * 7L) % 4096) - 2048).toInt & 0xffff)
      i += 1
    }
    bos.toByteArray
  }

  /** Planted-WAV column for a numeric id column (drives [[decodeWav]] with
    * independently verifiable samples, as [[withPlantedPng]] does for the
    * image kernel).
    */
  def withPlantedWav(df: DataFrame, idCol: String,
                     binaryCol: String): DataFrame = {
    val outSchema = df.schema.add(binaryCol, BinaryType)
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        Row.fromSeq(row.toSeq :+ plantedWav(row.getLong(idx)))
      }
    }(enc)
  }

  /** Near-duplicate image pairs by perceptual-hash Hamming distance:
    * all (idA < idB) pairs whose [[averageHash]] halves differ in at
    * most `maxHamming` of the 64 bits. Candidate generation is BANDED
    * (LSH shape, the MinHash lesson): the hash splits into four 16-bit
    * bands — by pigeonhole, Hamming ≤ 3 forces at least one band to
    * match EXACTLY, so candidates come from four |band value| bucket
    * joins, never an all-pairs cross; the exact Hamming distance
    * (bit_count of the xor, per 32-bit half — the halves keep every
    * term sign-safe for the SQL oracle) then verifies each candidate.
    * `maxHamming ≤ 3` is the banding guarantee; the verify step means
    * false candidates cost only their own comparison.
    */
  def ahashNearDupPairs(df: DataFrame, idCol: String,
                        hiCol: String, loCol: String,
                        maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4×16-bit banding guarantees recall only for maxHamming ≤ 3")
    val hashed = df.select(col(idCol), col(hiCol).as("_hi"),
        col(loCol).as("_lo"))
      .filter(col("_hi").isNotNull && col("_lo").isNotNull)
    val banded = hashed.select(col(idCol), col("_hi"), col("_lo"),
      explode(array(
        struct(lit(0).as("b"), (col("_lo") % 65536).as("v")),
        struct(lit(1).as("b"),
          (shiftright(col("_lo"), 16) % 65536).as("v")),
        struct(lit(2).as("b"), (col("_hi") % 65536).as("v")),
        struct(lit(3).as("b"),
          (shiftright(col("_hi"), 16) % 65536).as("v")))).as("_band"))
      .select(col(idCol), col("_hi"), col("_lo"),
        col("_band.b").as("_b"), col("_band.v").as("_v"))
    val a = banded.select(col(idCol).as("_ida"), col("_hi").as("_hia"),
      col("_lo").as("_loa"), col("_b"), col("_v"))
    val b = banded.select(col(idCol).as("_idb"), col("_hi").as("_hib"),
      col("_lo").as("_lob"), col("_b"), col("_v"))
    a.join(b, Seq("_b", "_v"))
      .filter(col("_ida") < col("_idb"))
      .select(col("_ida"), col("_idb"),
        (bit_count(col("_hia").bitwiseXOR(col("_hib"))) +
          bit_count(col("_loa").bitwiseXOR(col("_lob"))))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("_ida").as("id_a"), col("_idb").as("id_b"))
      .agg(min(col("hamming")).cast("int").as("hamming"))
  }
}
