package graft.multimodal

import graft.SparkSpec
import java.nio.charset.StandardCharsets.US_ASCII

/** Real-decode verification for the y4m video path: the fixtures are
  * byte-exact YUV4MPEG2 streams synthesized in-test (the format is an
  * ASCII header + raw planar frames, so ground truth is computable by
  * hand), driven through the same mapPartitions plumbing production
  * uses.
  */
class VideoCodecSpec extends SparkSpec {
  import spark.implicits._
  import Video._

  /** Build a C420 y4m stream: 4×2 pixels → frame = 8 Y + 2 U + 2 V. */
  private def y4m(frames: Seq[Array[Byte]], w: Int = 4, h: Int = 2,
      fps: String = "30:1"): Array[Byte] = {
    val header = s"YUV4MPEG2 W$w H$h F$fps Ip A1:1 C420jpeg\n".getBytes(US_ASCII)
    val chroma = new Array[Byte](w * h / 2) // U + V planes, zeros
    frames.foldLeft(header) { (acc, y) =>
      acc ++ "FRAME\n".getBytes(US_ASCII) ++ y ++ chroma
    }
  }

  private val f0 = Array.fill[Byte](8)(0)            // black frame
  private val f1 = Array.fill[Byte](8)(-1)           // 0xff → white frame
  private val f2 = (0 until 8).map(_.toByte).toArray // ramp: mean 3.5

  test("probe parses header and counts frames of a real y4m stream") {
    val bytes = y4m(Seq(f0, f1, f2))
    assert(Y4mCodec.probe(bytes) == Some((4, 2, 30, 1, 3)))
    // fps defaults to 25:1 when the F tag is absent
    val noF = ("YUV4MPEG2 W4 H2 C420\n".getBytes(US_ASCII)
      ++ "FRAME\n".getBytes(US_ASCII) ++ f0 ++ new Array[Byte](4))
    assert(Y4mCodec.probe(noF) == Some((4, 2, 25, 1, 1)))
  }

  test("non-y4m and truncated payloads probe to None, never throw") {
    assert(Y4mCodec.probe("not a video".getBytes(US_ASCII)).isEmpty)
    assert(Y4mCodec.probe(Array[Byte]()).isEmpty)
    // header fine, frame data cut short → that frame doesn't count
    val cut = y4m(Seq(f0)).dropRight(3)
    assert(Y4mCodec.probe(cut) == Some((4, 2, 30, 1, 0)))
  }

  test("frameLuminance returns the exact Y plane per frame") {
    val bytes = y4m(Seq(f0, f1, f2))
    assert(Y4mCodec.frameLuminance(bytes, 0).map(_._3.toSeq) == Some(f0.toSeq))
    assert(Y4mCodec.frameLuminance(bytes, 1).map(_._3.toSeq) == Some(f1.toSeq))
    assert(Y4mCodec.frameLuminance(bytes, 2).map(_._3.toSeq) == Some(f2.toSeq))
    assert(Y4mCodec.frameLuminance(bytes, 3).isEmpty)
    assert(Y4mCodec.frameLuminance(bytes, -1).isEmpty)
  }

  test("probeVideos drives real decode through the mapPartitions plumbing") {
    val rows = Seq(
      (1L, y4m(Seq(f0, f1))),
      (2L, y4m(Seq(f2), fps = "24:1")),
      (3L, "junk payload".getBytes(US_ASCII))).toDF("id", "payload")
    val out = Video.probeVideos(spark, rows, "id").collect()
      .map(m => m.id -> m).toMap
    assert(out.keySet == Set(1L, 2L)) // junk dropped, not crashed
    assert(out(1L).width == 4 && out(1L).height == 2 && out(1L).nFrames == 2
      && out(1L).fpsNum == 30)
    assert(out(2L).nFrames == 1 && out(2L).fpsNum == 24)
  }

  test("sampleFrameStats computes true per-frame brightness every nth frame") {
    val rows = Seq((7L, y4m(Seq(f0, f1, f2)))).toDF("id", "payload")
    val out = Video.sampleFrameStats(spark, rows, "id", everyNth = 2)
      .collect().sortBy(_.frameIdx)
    // frames 0 and 2 sampled; brightness = meanY/255 half-up at 6dp
    assert(out.map(_.frameIdx).toSeq == Seq(0, 2))
    assert(out(0).brightness == 0.0)
    assert(out(1).brightness == math.floor(3.5 / 255.0 * 1e6 + 0.5) / 1e6)
    val all = Video.sampleFrameStats(spark, rows, "id", everyNth = 1).collect()
    assert(all.length == 3 && all.exists(_.brightness == 1.0)) // white frame
  }
}
