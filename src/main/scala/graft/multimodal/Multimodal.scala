package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns plus typed metadata. The Spark-side machinery —
  * schema, batch iteration, partitioning, metadata extraction — is real
  * and tested; the codec is a pluggable [[ImageCodec]]: the DEFAULT is
  * [[FakeCodec]], a deterministic fake whose output depends only on
  * the payload bytes (the cross-engine oracle replicates its
  * arithmetic), and [[ImageIoCodec]] decodes real PNG/JPEG bytes via
  * in-JVM `javax.imageio` through the exact same mapPartitions
  * boundary. Audio/video codecs would slot in the same way (JNI/
  * javacpp in production); nothing outside the codec object changes.
  *
  * Scale notes: decode runs in `mapPartitions` so per-partition codec
  * state is initialized once, not per row (the same shape a Python
  * pipeline gets from mapInPandas batches). Payloads stay off the
  * driver; metadata-only queries never touch the binary column thanks
  * to parquet column pruning.
  */
object Multimodal {

  /** Typed row for decoded media features. */
  case class MediaFeature(
      id: Long,
      byteLen: Int,
      width: Int,
      height: Int,
      channels: Int,
      brightness: Double)

  /** The pluggable codec boundary. Implementations ship inside the
    * mapPartitions closure (hence Serializable) and see only payload
    * bytes — the Spark-side plumbing (schema, batching, partitioning)
    * is codec-agnostic, so swapping the stub for a real decoder
    * changes NOTHING else.
    */
  trait ImageCodec extends Serializable {
    /** (width, height, channels, brightness∈[0,1]), or None when the
      * payload is not decodable by this codec.
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Double)]

    /** Row-major w×h luminance plane for resampling, or None when not
      * decodable — the single-channel view [[Multimodal.resize]]
      * samples from.
      */
    def luminance(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])]
  }

  /** Deterministic fake decoder: "dimensions" and "pixel stats" derived
    * purely from payload bytes — the oracle-verifiable stand-in for a
    * real codec (its arithmetic is replicated in the DuckDB oracle
    * SQL, so keep it bit-stable). Decodes everything.
    */
  object FakeCodec extends ImageCodec {
    def decodeRaw(bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val n = bytes.length
      val w = 16 + math.abs(if (n > 0) bytes(0).toInt else 0) % 48
      val h = 16 + math.abs(if (n > 1) bytes(1).toInt else 0) % 48
      val c = 1 + (n % 3)
      val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      val brightness = if (n > 0) sum.toDouble / n / 255.0 else 0.0
      (w, h, c, brightness)
    }

    override def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] =
      Some(decodeRaw(bytes))

    /** The payload bytes tiled modulo their length into the fake w×h
      * grid — index (x + y·w) reads bytes((x + y·w) % n), exactly the
      * sampling rule the resize oracle replicates.
      */
    override def luminance(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      val (w, h, _, _) = decodeRaw(bytes)
      val n = bytes.length
      val plane = new Array[Byte](w * h)
      var i = 0
      while (i < plane.length) {
        plane(i) = if (n > 0) bytes(i % n) else 0.toByte
        i += 1
      }
      Some((w, h, plane))
    }
  }

  /** Real image codec over in-JVM `javax.imageio` (PNG/JPEG/GIF/BMP —
    * no external dependencies): same [[ImageCodec]] boundary, same
    * mapPartitions plumbing, actual pixels. Payloads ImageIO cannot
    * parse decode to None (callers drop or route them). Brightness is
    * the mean integer luminance ((r+g+b)/3, truncating — deterministic)
    * over all pixels, scaled to [0,1].
    */
  object ImageIoCodec extends ImageCodec {
    private def read(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    override def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] =
      read(bytes).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        (w, h, img.getColorModel.getNumComponents,
          if (w * h > 0) sum.toDouble / (w.toLong * h) / 255.0 else 0.0)
      }

    override def luminance(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      read(bytes).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val plane = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            plane(y * w + x) =
              ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3).toByte
            x += 1
          }
          y += 1
        }
        (w, h, plane)
      }
  }

  /** Attach a binary payload column (here: the UTF-8 bytes of a text
    * column — the stand-in for real image bytes, which the synthetic
    * tables don't carry).
    */
  def withPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast(BinaryType))

  /** Metadata extraction that never decodes: byte length + content hash.
    * Pure expressions → pushdown-friendly and codegen'd.
    */
  def metadata(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol),
      length(col("payload")).as("byte_len"),
      sha2(col("payload"), 256).as("sha256"))

  /** Batch decode via mapPartitions: codec init once per partition,
    * rows streamed through. Returns a typed Dataset with an explicit
    * schema — the contract a downstream feature store consumes.
    * Payloads the codec cannot decode are dropped (never happens with
    * the default [[FakeCodec]], which decodes everything).
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
      codec: ImageCodec = FakeCodec): Dataset[MediaFeature] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec state is initialized here, once
        rows.flatMap { case (id, bytes) =>
          codec.decode(bytes).map { case (w, h, c, bright) =>
            // half-up at 6dp (floor(x*1e6+0.5)) — reproducible across
            // engines, unlike rint's half-even
            MediaFeature(id, bytes.length, w, h, c,
              math.floor(bright * 1e6 + 0.5) / 1e6)
          }
        }
      }
  }

  /** Typed row for resized media: the resized payload plus the scalar
    * features the oracle can verify.
    */
  /** Perceptual average-hash over the 8×8 downsampled luminance plane:
    * bit i is 1 iff sample i exceeds the plane mean (compared as
    * sample·64 > Σsamples — exact integer arithmetic, no float mean),
    * emitted as a 64-char '0'/'1' string (row-major) so bit 63 never
    * wrestles with signed-long packing. Identical or near-identical
    * images collapse to the same hash — the image-side exact-dedup
    * key, and the input to Hamming-banded near-dup (split the string
    * in 4 bands of 16, SimHash-style) when fuzzy matching is needed.
    * Runs through the same pluggable codec boundary as [[resize]].
    */
  def perceptualHash(spark: SparkSession, df: DataFrame, idCol: String,
      codec: ImageCodec = FakeCodec): DataFrame = {
    import spark.implicits._
    resize(spark, df, idCol, outW = 8, outH = 8, codec)
      .map { r =>
        val sum = r.resized.foldLeft(0L)((a, b) => a + (b & 0xff))
        val bits = r.resized.map(b =>
          if ((b & 0xff) * 64L > sum) '1' else '0').mkString
        (r.id, bits)
      }
      .toDF(idCol, "phash")
  }

  case class ResizedMedia(
      id: Long,
      srcW: Int,
      srcH: Int,
      outW: Int,
      outH: Int,
      resized: Array[Byte],
      checksum: Long)

  /** Deterministic nearest-neighbor resize over the codec's luminance
    * plane (with the default [[FakeCodec]]: the payload bytes tiled
    * into the fake grid — the arithmetic the oracle replicates; with
    * [[ImageIoCodec]]: real pixels). Same mapPartitions codec boundary
    * as [[decodeFeatures]]. The resized bytes travel as a binary
    * column; `checksum` (byte sum) lets the oracle verify the sampling
    * arithmetic without shipping blobs through SQL. Undecodable
    * payloads are dropped.
    */
  def resize(spark: SparkSession, df: DataFrame, idCol: String,
      outW: Int, outH: Int, codec: ImageCodec = FakeCodec): Dataset[ResizedMedia] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          codec.luminance(bytes).map { case (w, h, plane) =>
            val out = new Array[Byte](outW * outH)
            var checksum = 0L
            var y = 0
            while (y < outH) {
              val sy = y * h / outH
              var x = 0
              while (x < outW) {
                val sx = x * w / outW
                val b = if (plane.nonEmpty) plane(sx + sy * w) else 0.toByte
                out(y * outW + x) = b
                checksum += (b & 0xff)
                x += 1
              }
              y += 1
            }
            ResizedMedia(id, w, h, outW, outH, out, checksum)
          }
        }
      }
  }

  /** Deterministic frame sampling plumbing: split a payload into
    * fixed-size "frames" (stand-in for video frame extraction) and
    * explode to one row per sampled frame, keeping every nth frame.
    */
  def sampleFrames(df: DataFrame, idCol: String, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast(DoubleType) / frameBytes).cast(IntegerType)
    df.select(col(idCol), col("payload"), nFrames.as("n_frames"))
      .select(col(idCol), col("payload"), col("n_frames"),
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)))).as("frame_idx"))
      .filter(col("frame_idx") % everyNth === 0)
      .select(col(idCol), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
  }
}
