package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real video decoding through the same pluggable-codec discipline as
  * [[Multimodal.ImageCodec]]: the Spark-side plumbing (mapPartitions
  * batching, typed schemas, partitioning) is codec-agnostic, and the
  * shipped implementations handle actual container formats with zero
  * external dependencies — YUV4MPEG2 (`.y4m`), the uncompressed
  * interchange format every ffmpeg pipeline can emit (`ffmpeg -i x.mp4
  * x.y4m`), and raw MJPEG (concatenated JPEG frames, the common
  * camera/HTTP-multipart payload) decoded per-frame via the in-JVM
  * `javax.imageio` seam [[Multimodal.ImageIoCodec]] already uses.
  * Compressed inter-frame codecs (H.264 etc.) need native libraries
  * this sandbox doesn't ship; they would slot behind the same trait
  * via JNI/javacpp with nothing outside the codec object changing.
  *
  * Robustness contract: payloads the codec cannot parse are DROPPED,
  * never thrown on — a 100 TB media crawl always contains corrupt
  * streams, and one bad payload must not fail a Spark stage. Frame
  * geometry is computed in Long and validated against the payload
  * length before any offset walk, so crafted headers (overflowing
  * W·H, truncated frames) degrade to None/zero frames.
  */
object Video {

  /** Pluggable video codec boundary: probe stream-level metadata and
    * extract per-frame luminance planes from raw payload bytes.
    */
  trait VideoCodec extends Serializable {
    /** (width, height, fpsNum, fpsDen, frameCount), or None when the
      * payload is not this container. fpsNum = 0 means the container
      * carries no timing metadata (MJPEG).
      */
    def probe(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)]

    /** Row-major w×h luminance plane of frame `idx` (0-based), or None
      * when the payload/index is invalid.
      */
    def frameLuminance(bytes: Array[Byte], idx: Int): Option[(Int, Int, Array[Byte])]

    /** Every-nth luminance plane in ONE forward pass over the payload:
      * (frameIdx, w, h, plane). The default composes [[probe]] +
      * [[frameLuminance]] (correct for any codec, O(frames²) for
      * stream formats that must re-walk from the start); stream codecs
      * override it with a single sequential decode.
      */
    def frameLuminances(bytes: Array[Byte],
        everyNth: Int): Iterator[(Int, Int, Int, Array[Byte])] =
      probe(bytes).iterator.flatMap { case (_, _, _, _, n) =>
        (0 until n by everyNth).iterator.flatMap { i =>
          frameLuminance(bytes, i).map { case (w, h, p) => (i, w, h, p) }
        }
      }
  }

  /** YUV4MPEG2 decoder, pure JVM. Stream layout: an ASCII header line
    * `YUV4MPEG2 W<w> H<h> F<num>:<den> [I.. A.. C<sub>]\n`, then per
    * frame an ASCII `FRAME[ params]\n` marker followed by the raw
    * planar picture — Y plane (w·h bytes) then subsampled U and V.
    * Chroma subsampling (the C tag) fixes the frame byte size; the
    * subsampled planes are ceil(w/2)- and/or ceil(h/2)-sized for odd
    * dimensions (420 → w·h + 2·⌈w/2⌉·⌈h/2⌉, 422 → w·h + 2·⌈w/2⌉·h,
    * 444 → 3·w·h, mono → w·h). The luminance plane is simply the
    * frame's first w·h bytes, so frame extraction needs no arithmetic
    * beyond offsets — which is why y4m is the right dependency-free
    * REAL format for this seam.
    *
    * All geometry is computed in Long and rejected when the frame
    * size is non-positive, exceeds the payload, or exceeds a byte
    * array's addressable range — a crafted `W46341 H46341` header
    * must parse to None, not overflow into a negative frame stride.
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
        val y = w.toLong * h.toLong
        val cw = (w.toLong + 1) / 2 // ceil halving: odd dims round up
        val ch = (h.toLong + 1) / 2
        val frameBytes: Long =
          if (chroma.startsWith("420")) y + 2L * cw * ch
          else if (chroma.startsWith("422")) y + 2L * cw * h.toLong
          else if (chroma.startsWith("444")) 3L * y
          else if (chroma.startsWith("mono")) y
          else return None
        // a frame that can't fit in any JVM byte array (or this
        // payload) can never decode: reject at the header so the
        // offset walk below always advances by a positive Int
        if (frameBytes <= 0L || frameBytes > bytes.length.toLong) return None
        Some((w, h, fn, fd, frameBytes.toInt, eol + 1))
      } catch { case _: Exception => None }
    }

    /** Data offset of the next frame at marker position `off`, or None
      * when the stream ends/corrupts. frameBytes ≥ 1 is guaranteed by
      * [[header]], so `data + frameBytes` strictly advances.
      */
    private def nextFrame(bytes: Array[Byte], off: Int, frameBytes: Int): Option[Int] = {
      if (off + 5 > bytes.length ||
        new String(bytes, off, 5, java.nio.charset.StandardCharsets.US_ASCII) != "FRAME")
        return None
      var eol = off + 5
      while (eol < bytes.length && bytes(eol) != '\n'.toByte) eol += 1
      if (eol >= bytes.length) return None
      val data = eol + 1
      if (data.toLong + frameBytes > bytes.length.toLong) None else Some(data)
    }

    /** Offset of frame `idx`'s picture data, walking FRAME markers. */
    private def frameOffset(bytes: Array[Byte], start: Int, frameBytes: Int,
        idx: Int): Option[Int] = {
      var off = start
      var i = 0
      while (off < bytes.length) {
        nextFrame(bytes, off, frameBytes) match {
          case Some(data) =>
            if (i == idx) return Some(data)
            off = data + frameBytes
            i += 1
          case None => return None
        }
      }
      None
    }

    override def probe(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] =
      try {
        header(bytes).map { case (w, h, fn, fd, frameBytes, start) =>
          var off = start
          var n = 0
          var ok = true
          while (ok && off < bytes.length) {
            nextFrame(bytes, off, frameBytes) match {
              case Some(data) => n += 1; off = data + frameBytes
              case None => ok = false
            }
          }
          (w, h, fn, fd, n)
        }
      } catch { case _: Exception => None } // corrupt payload ⇒ dropped

    override def frameLuminance(bytes: Array[Byte], idx: Int): Option[(Int, Int, Array[Byte])] =
      try {
        header(bytes).flatMap { case (w, h, _, _, frameBytes, start) =>
          if (idx < 0) None
          else frameOffset(bytes, start, frameBytes, idx).map { data =>
            (w, h, java.util.Arrays.copyOfRange(bytes, data, data + w * h))
          }
        }
      } catch { case _: Exception => None }

    /** Single forward pass: header once, every FRAME marker visited
      * once, every nth luminance plane copied out — O(stream length)
      * regardless of frame count, vs the default's re-walk per frame.
      */
    override def frameLuminances(bytes: Array[Byte],
        everyNth: Int): Iterator[(Int, Int, Int, Array[Byte])] =
      try {
        header(bytes) match {
          case None => Iterator.empty
          case Some((w, h, _, _, frameBytes, start)) =>
            val out = Vector.newBuilder[(Int, Int, Int, Array[Byte])]
            var off = start
            var i = 0
            var ok = true
            while (ok && off < bytes.length) {
              nextFrame(bytes, off, frameBytes) match {
                case Some(data) =>
                  if (i % everyNth == 0)
                    out += ((i, w, h,
                      java.util.Arrays.copyOfRange(bytes, data, data + w * h)))
                  off = data + frameBytes
                  i += 1
                case None => ok = false
              }
            }
            out.result().iterator
        }
      } catch { case _: Exception => Iterator.empty }
  }

  /** Raw MJPEG decoder: the payload is concatenated complete JPEG
    * images (the wire format of motion-JPEG cameras and HTTP
    * multipart streams, and what `ffmpeg -c:v mjpeg -f mjpeg` emits).
    * Frame boundaries are found by walking the JPEG marker structure —
    * SOI, length-delimited segments, entropy-coded scan data (where
    * 0xFF is stuffed as FF00 and only restart markers FFD0–D7 appear)
    * up to EOI — and each frame decodes through the same in-JVM
    * `javax.imageio` path as [[Multimodal.ImageIoCodec]]. MJPEG
    * carries no timing metadata, so fps reports as 0:1 (unknown);
    * width/height come from the first decodable frame. Trailing bytes
    * that don't parse as a complete JPEG are ignored (truncated-tail
    * streams keep their whole frames), and a payload that doesn't
    * start with SOI probes to None.
    */
  object MjpegCodec extends VideoCodec {
    /** (start, end) byte ranges of complete JPEG frames, walked
      * left-to-right; stops at the first malformed/truncated frame.
      */
    private def frameRanges(bytes: Array[Byte]): Vector[(Int, Int)] = {
      val out = Vector.newBuilder[(Int, Int)]
      var i = 0
      var ok = true
      def b(p: Int): Int = bytes(p) & 0xff
      while (ok && i + 3 < bytes.length && b(i) == 0xff && b(i + 1) == 0xd8) {
        // inside one JPEG: j sits at a marker's 0xFF byte
        var j = i + 2
        var end = -1
        var fine = true
        while (fine && end < 0) {
          if (j + 1 >= bytes.length || b(j) != 0xff) fine = false
          else b(j + 1) match {
            case 0xd9 => end = j + 2 // EOI
            case m if m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
              j += 2 // standalone markers, no length field
            case 0xda => // SOS: length-delimited header, then entropy data
              if (j + 3 >= bytes.length) fine = false
              else {
                var k = j + 2 + ((b(j + 2) << 8) | b(j + 3))
                // scan entropy-coded data: FF00 is a stuffed literal,
                // FFD0-D7 are restart markers; any other FFxx ends it
                var found = false
                while (!found && k + 1 < bytes.length) {
                  if (b(k) == 0xff && b(k + 1) != 0x00 &&
                    (b(k + 1) < 0xd0 || b(k + 1) > 0xd7)) found = true
                  else k += 1
                }
                if (found) j = k else fine = false
              }
            case _ => // length-delimited segment
              if (j + 3 >= bytes.length) fine = false
              else j += 2 + ((b(j + 2) << 8) | b(j + 3))
          }
        }
        if (fine && end > 0) { out += ((i, end)); i = end } else ok = false
      }
      out.result()
    }

    private def slice(bytes: Array[Byte], r: (Int, Int)): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, r._1, r._2)

    override def probe(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] =
      try {
        val ranges = frameRanges(bytes)
        if (ranges.isEmpty) None
        else Multimodal.ImageIoCodec.luminance(slice(bytes, ranges.head))
          .map { case (w, h, _) => (w, h, 0, 1, ranges.length) }
      } catch { case _: Exception => None }

    override def frameLuminance(bytes: Array[Byte], idx: Int): Option[(Int, Int, Array[Byte])] =
      try {
        val ranges = frameRanges(bytes)
        if (idx < 0 || idx >= ranges.length) None
        else Multimodal.ImageIoCodec.luminance(slice(bytes, ranges(idx)))
      } catch { case _: Exception => None }

    /** One marker walk + one ImageIO decode per SAMPLED frame (skipped
      * frames are never pixel-decoded — the range walk is cheap).
      */
    override def frameLuminances(bytes: Array[Byte],
        everyNth: Int): Iterator[(Int, Int, Int, Array[Byte])] =
      try {
        val ranges = frameRanges(bytes)
        (0 until ranges.length by everyNth).iterator.flatMap { i =>
          Multimodal.ImageIoCodec.luminance(slice(bytes, ranges(i)))
            .map { case (w, h, p) => (i, w, h, p) }
        }
      } catch { case _: Exception => Iterator.empty }
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
    * byte-split plumbing stub. One output row per sampled frame; one
    * forward pass per payload via [[VideoCodec.frameLuminances]].
    */
  def sampleFrameStats(spark: SparkSession, df: DataFrame, idCol: String,
      everyNth: Int, codec: VideoCodec = Y4mCodec): Dataset[FrameStat] = {
    require(everyNth >= 1, "everyNth must be >= 1")
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          codec.frameLuminances(bytes, everyNth).map { case (i, w, h, plane) =>
            val sum = plane.foldLeft(0L)((a, b) => a + (b & 0xff))
            val bright =
              if (plane.nonEmpty) sum.toDouble / plane.length / 255.0 else 0.0
            FrameStat(id, i, w, h, math.floor(bright * 1e6 + 0.5) / 1e6)
          }
        }
      }
  }
}
