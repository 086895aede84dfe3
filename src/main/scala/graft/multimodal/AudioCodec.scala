package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real audio decoding through the same pluggable-codec discipline as
  * [[Video]]: the shipped implementation parses actual WAV containers
  * (RIFF/WAVE with a PCM `fmt ` chunk — what `ffmpeg -i x.mp3 x.wav`
  * emits) in pure JVM; compressed codecs (mp3/aac/opus) need native
  * libraries this sandbox doesn't ship and would slot behind the same
  * trait with nothing outside the codec object changing.
  *
  * Robustness contract (the [[Video]] lesson, applied from day one):
  * all sizes are computed in Long and validated against the payload
  * BEFORE any read — crafted chunk lengths, truncated data sections,
  * or non-PCM formats degrade to None, never to a thrown stage, and a
  * declared data size larger than the bytes present clamps to what is
  * actually there.
  */
object Audio {

  /** (sampleRate, channels, bitsPerSample, nFrames) — nFrames = sample
    * frames (all channels together count once).
    */
  final case class AudioMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else nFrames * 1000L / sampleRate
  }

  trait AudioCodec extends Serializable {
    def probe(bytes: Array[Byte]): Option[AudioMeta]
    /** (meta, rms, peak) over the 16-bit PCM samples, amplitudes
      * normalized to [0, 1]; one forward pass.
      */
    def loudness(bytes: Array[Byte]): Option[(AudioMeta, Double, Double)]
  }

  /** RIFF/WAVE PCM parser: 'RIFF' <size> 'WAVE', then chunks
    * '<id><len><payload>' (word-aligned); needs a PCM (audioFormat 1)
    * 16-bit `fmt ` chunk before `data`.
    */
  object WavCodec extends AudioCodec {

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** (meta, dataOffset, dataLen) after full validation. */
    private def parse(b: Array[Byte]): Option[(AudioMeta, Int, Int)] = {
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
        return None
      var off = 12L
      var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
      var data: Option[(Long, Long)] = None   // (offset, len)
      while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(b, off.toInt)
        val len = le32(b, off.toInt + 4) // unsigned chunk size, as Long
        val body = off + 8
        id match {
          case "fmt " =>
            if (len < 16 || body + 16 > b.length) return None
            val audioFormat = le16(b, body.toInt)
            val channels = le16(b, body.toInt + 2)
            val rate = le32(b, body.toInt + 4)
            val bits = le16(b, body.toInt + 14)
            // PCM 16-bit only; anything else is not this codec's job
            if (audioFormat != 1 || bits != 16 || channels <= 0 ||
              rate <= 0 || rate > Int.MaxValue) return None
            fmt = Some((rate.toInt, channels, bits))
          case "data" =>
            // clamp a declared size past the payload to what exists
            val avail = math.max(0L, b.length.toLong - body)
            data = Some((body, math.min(len, avail)))
          case _ => ()
        }
        off = body + len + (len & 1) // chunks are word-aligned
      }
      for ((rate, ch, bits) <- fmt; (dOff, dLen) <- data) yield {
        val bytesPerFrame = ch.toLong * (bits / 8)
        val nFrames = if (bytesPerFrame == 0) 0L else dLen / bytesPerFrame
        (AudioMeta(rate, ch, bits, nFrames), dOff.toInt, dLen.toInt)
      }
    }

    override def probe(bytes: Array[Byte]): Option[AudioMeta] =
      try parse(bytes).map(_._1) catch { case _: Exception => None }

    override def loudness(bytes: Array[Byte]): Option[(AudioMeta, Double, Double)] =
      try parse(bytes).map { case (meta, off, len) =>
        var i = off
        val end = off + len - (len % 2)
        var sumSq = 0.0
        var peak = 0L
        var n = 0L
        while (i + 1 < end) {
          val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
          sumSq += (s.toDouble / 32768.0) * (s.toDouble / 32768.0)
          val a = math.abs(s)
          if (a > peak) peak = a
          n += 1
          i += 2
        }
        val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
        (meta, rms, peak.toDouble / 32768.0)
      } catch { case _: Exception => None }
  }

  final case class AudioFeature(id: Long, n_bytes: Long, sample_rate: Int,
      channels: Int, duration_ms: Long, rms: Double, peak: Double)

  /** Per-payload audio features through the mapPartitions codec seam
    * (the [[Multimodal.decodeFeatures]] shape): unparseable payloads
    * are dropped, the stage never fails.
    */
  def audioFeatures(spark: SparkSession, df: DataFrame, idCol: String,
      codec: AudioCodec = WavCodec): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          codec.loudness(bytes).map { case (m, rms, peak) =>
            AudioFeature(id, bytes.length, m.sampleRate, m.channels,
              m.durationMs,
              math.floor(rms * 1e6 + 0.5) / 1e6,
              math.floor(peak * 1e6 + 0.5) / 1e6)
          }
        }
      }.toDF()
  }
}
