package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns plus typed metadata. The Spark-side machinery —
  * schema, batch iteration, partitioning, metadata extraction — is real
  * and tested; the codec itself is STUBBED (this container has no
  * image/audio libraries) behind [[FakeCodec]], a deterministic fake
  * whose output depends only on the payload bytes. Swap `FakeCodec` for
  * a JNI/javacpp decoder in production; nothing else changes.
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

  /** Deterministic fake decoder: "dimensions" and "pixel stats" derived
    * purely from payload bytes. Replace with a real codec in production.
    */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val n = bytes.length
      val w = 16 + math.abs(if (n > 0) bytes(0).toInt else 0) % 48
      val h = 16 + math.abs(if (n > 1) bytes(1).toInt else 0) % 48
      val c = 1 + (n % 3)
      val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      val brightness = if (n > 0) sum.toDouble / n / 255.0 else 0.0
      (w, h, c, brightness)
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
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaFeature] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here
        rows.map { case (id, bytes) =>
          val (w, h, c, bright) = FakeCodec.decode(bytes)
          // half-up at 6dp (floor(x*1e6+0.5)) — reproducible across
          // engines, unlike rint's half-even
          MediaFeature(id, bytes.length, w, h, c,
            math.floor(bright * 1e6 + 0.5) / 1e6)
        }
      }
  }

  /** Typed row for resized media: the resized payload plus the scalar
    * features the oracle can verify.
    */
  case class ResizedMedia(
      id: Long,
      srcW: Int,
      srcH: Int,
      outW: Int,
      outH: Int,
      resized: Array[Byte],
      checksum: Long)

  /** Deterministic fake resize: nearest-neighbor sampling of the
    * payload bytes viewed as a (srcW × srcH) pixel buffer (dims from
    * [[FakeCodec]]), wrapped modulo payload length so every source
    * index is valid. Same mapPartitions codec boundary as
    * [[decodeFeatures]] — swap the sampling loop for a real scaler and
    * nothing else changes. The resized bytes travel as a binary
    * column; `checksum` (byte sum) lets the oracle verify the sampling
    * arithmetic without shipping blobs through SQL.
    */
  def resize(spark: SparkSession, df: DataFrame, idCol: String,
      outW: Int, outH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (w, h, _, _) = FakeCodec.decode(bytes)
          val n = bytes.length
          val out = new Array[Byte](outW * outH)
          var checksum = 0L
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              val sx = x * w / outW
              val b = if (n > 0) bytes((sx + sy * w) % n) else 0.toByte
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
