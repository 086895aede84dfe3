package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real video decoding through the same pluggable-codec discipline as
  * [[Multimodal.ImageCodec]]: the Spark-side plumbing (mapPartitions
  * batching, typed schemas, partitioning) is codec-agnostic, and the
  * shipped implementation handles an actual container format with
  * zero external dependencies — YUV4MPEG2 (`.y4m`), the uncompressed
  * interchange format every ffmpeg pipeline can emit (`ffmpeg -i x.mp4
  * x.y4m`). Compressed codecs (H.264 etc.) need native libraries this
  * sandbox doesn't ship; they would slot behind the same trait via
  * JNI/javacpp with nothing outside the codec object changing —
  * exactly the [[Multimodal.ImageIoCodec]] pattern for images.
  */
object Video {

  /** Pluggable video codec boundary: probe stream-level metadata and
    * extract per-frame luminance planes from raw payload bytes.
    */
  trait VideoCodec extends Serializable {
    /** (width, height, fpsNum, fpsDen, frameCount), or None when the
      * payload is not this container.
      */
    def probe(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)]

    /** Row-major w×h luminance plane of frame `idx` (0-based), or None
      * when the payload/index is invalid.
      */
    def frameLuminance(bytes: Array[Byte], idx: Int): Option[(Int, Int, Array[Byte])]
  }

  /** YUV4MPEG2 decoder, pure JVM. Stream layout: an ASCII header line
    * `YUV4MPEG2 W<w> H<h> F<num>:<den> [I.. A.. C<sub>]\n`, then per
    * frame an ASCII `FRAME[ params]\n` marker followed by the raw
    * planar picture — Y plane (w·h bytes) then subsampled U and V.
    * Chroma subsampling (the C tag) fixes the frame byte size:
    * 420 family → w·h·3/2, 422 → 2·w·h, 444 → 3·w·h, mono → w·h.
    * The luminance plane is simply the frame's first w·h bytes, so
    * frame extraction needs no arithmetic beyond offsets — which is
    * why y4m is the right dependency-free REAL format for this seam.
    */
  object Y4mCodec extends VideoCodec {
    private val Magic = "YUV4MPEG2"

    /** (w, h, fpsNum, fpsDen, frameBytes, firstFrameOffset) */
    private def header(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] = {
      val eol = bytes.indexOf('\n'.toByte)
      if (eol < 0) return None
      val line = new String(bytes, 0, eol, java.nio.charset.StandardCharsets.US_ASCII)
      if (!line.startsWith(Magic)) return None
      val params = line.split(' ').drop(1)
      def tag(t: Char): Option[String] =
        params.find(p => p.nonEmpty && p.head == t).map(_.tail)
      try {
        val w = tag('W').map(_.toInt).getOrElse(return None)
        val h = tag('H').map(_.toInt).getOrElse(return None)
        if (w <= 0 || h <= 0) return None
        val (fn, fd) = tag('F') match {
          case Some(f) =>
            val Array(a, b) = f.split(':'); (a.toInt, b.toInt)
          case None => (25, 1) // y4m default
        }
        val chroma = tag('C').getOrElse("420")
        val frameBytes =
          if (chroma.startsWith("420")) w * h * 3 / 2
          else if (chroma.startsWith("422")) w * h * 2
          else if (chroma.startsWith("444")) w * h * 3
          else if (chroma.startsWith("mono")) w * h
          else return None
        Some((w, h, fn, fd, frameBytes, eol + 1))
      } catch { case _: Exception => None }
    }

    /** Offset of frame `idx`'s picture data, walking FRAME markers. */
    private def frameOffset(bytes: Array[Byte], start: Int, frameBytes: Int,
        idx: Int): Option[Int] = {
      var off = start
      var i = 0
      while (off < bytes.length) {
        // expect "FRAME", then parameters until '\n'
        if (off + 5 > bytes.length ||
          new String(bytes, off, 5, java.nio.charset.StandardCharsets.US_ASCII) != "FRAME")
          return None
        var eol = off + 5
        while (eol < bytes.length && bytes(eol) != '\n'.toByte) eol += 1
        if (eol >= bytes.length) return None
        val data = eol + 1
        if (data + frameBytes > bytes.length) return None
        if (i == idx) return Some(data)
        off = data + frameBytes
        i += 1
      }
      None
    }

    override def probe(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] =
      header(bytes).map { case (w, h, fn, fd, frameBytes, start) =>
        var off = start
        var n = 0
        var ok = true
        while (ok && off < bytes.length) {
          frameOffset(bytes, off, frameBytes, 0) match {
            case Some(data) => n += 1; off = data + frameBytes
            case None => ok = false
          }
        }
        (w, h, fn, fd, n)
      }

    override def frameLuminance(bytes: Array[Byte], idx: Int): Option[(Int, Int, Array[Byte])] =
      header(bytes).flatMap { case (w, h, _, _, frameBytes, start) =>
        if (idx < 0) None
        else frameOffset(bytes, start, frameBytes, idx).map { data =>
          (w, h, java.util.Arrays.copyOfRange(bytes, data, data + w * h))
        }
      }
  }

  /** Typed row for probed video streams. */
  case class VideoMeta(id: Long, byteLen: Int, width: Int, height: Int,
      fpsNum: Int, fpsDen: Int, nFrames: Int)

  /** Typed row for sampled frames: per-frame mean luminance in [0,1],
    * half-up at 6dp (the [[Multimodal.decodeFeatures]] discipline).
    */
  case class FrameStat(id: Long, frameIdx: Int, width: Int, height: Int,
      brightness: Double)

  /** Stream-level probe via mapPartitions (codec state once per
    * partition; payloads the codec cannot parse are dropped).
    */
  def probeVideos(spark: SparkSession, df: DataFrame, idCol: String,
      codec: VideoCodec = Y4mCodec): Dataset[VideoMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          codec.probe(bytes).map { case (w, h, fn, fd, n) =>
            VideoMeta(id, bytes.length, w, h, fn, fd, n)
          }
        }
      }
  }

  /** Every-nth frame sampling with REAL per-frame luminance stats —
    * the actual-decode counterpart of [[Multimodal.sampleFrames]]'s
    * byte-split plumbing stub. One output row per sampled frame.
    */
  def sampleFrameStats(spark: SparkSession, df: DataFrame, idCol: String,
      everyNth: Int, codec: VideoCodec = Y4mCodec): Dataset[FrameStat] = {
    require(everyNth >= 1, "everyNth must be >= 1")
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          codec.probe(bytes).toSeq.flatMap { case (_, _, _, _, n) =>
            (0 until n by everyNth).flatMap { i =>
              codec.frameLuminance(bytes, i).map { case (w, h, plane) =>
                val sum = plane.foldLeft(0L)((a, b) => a + (b & 0xff))
                val bright =
                  if (plane.nonEmpty) sum.toDouble / plane.length / 255.0 else 0.0
                FrameStat(id, i, w, h, math.floor(bright * 1e6 + 0.5) / 1e6)
              }
            }
          }
        }
      }
  }
}
