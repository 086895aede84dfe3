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

  test("crafted overflow headers and junk degrade to None, never negative strides") {
    // W·H·3/2 overflows Int for 46341² — must reject at the header,
    // not walk backwards off a negative frame size
    val crafted = ("YUV4MPEG2 W46341 H46341 F30:1 C420\n" + "FRAME\n")
      .getBytes(US_ASCII) ++ Array.fill[Byte](64)(1)
    assert(Y4mCodec.probe(crafted).isEmpty)
    assert(Y4mCodec.frameLuminance(crafted, 0).isEmpty)
    // absurd-but-parseable dims larger than the payload: reject too
    val big = ("YUV4MPEG2 W10000 H10000 C444\n").getBytes(US_ASCII) ++
      Array.fill[Byte](32)(0)
    assert(Y4mCodec.probe(big).isEmpty)
    // zero/negative dims
    assert(Y4mCodec.probe("YUV4MPEG2 W0 H4 C420\nFRAME\n".getBytes(US_ASCII)).isEmpty)
    assert(Y4mCodec.probe("YUV4MPEG2 W-4 H4 C420\nFRAME\n".getBytes(US_ASCII)).isEmpty)
  }

  test("odd dimensions use ceil-halved chroma planes (no offset drift)") {
    // 3×3 C420: Y = 9, U = V = ceil(3/2)² = 4 → frame = 17 bytes
    val w = 3; val h = 3
    val y0 = Array.fill[Byte](9)(10)
    val y1 = Array.fill[Byte](9)(20)
    val chroma = new Array[Byte](8)
    val bytes = s"YUV4MPEG2 W$w H$h F30:1 C420\n".getBytes(US_ASCII) ++
      "FRAME\n".getBytes(US_ASCII) ++ y0 ++ chroma ++
      "FRAME\n".getBytes(US_ASCII) ++ y1 ++ chroma
    assert(Y4mCodec.probe(bytes) == Some((3, 3, 30, 1, 2)))
    // frame 1 decodes the RIGHT bytes — truncating w*h*3/2 would have
    // drifted the second frame's offset by one byte
    assert(Y4mCodec.frameLuminance(bytes, 1).map(_._3.toSeq) == Some(y1.toSeq))
  }

  test("frameLuminances single pass ≡ per-frame decode on every stride") {
    val bytes = y4m(Seq(f0, f1, f2))
    for (nth <- 1 to 3) {
      val onePass = Y4mCodec.frameLuminances(bytes, nth)
        .map { case (i, w, h, p) => (i, w, h, p.toSeq) }.toSeq
      val perFrame = (0 until 3 by nth).flatMap { i =>
        Y4mCodec.frameLuminance(bytes, i).map { case (w, h, p) => (i, w, h, p.toSeq) }
      }
      assert(onePass == perFrame, s"stride $nth")
    }
  }

  // ------------------------------------------------------------- MJPEG

  /** A solid-color w×h JPEG frame encoded via the in-JVM ImageIO
    * writer (the exact bytes a motion-JPEG camera would emit).
    */
  private def jpegFrame(w: Int, h: Int, lum: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("MJPEG: probe counts concatenated JPEG frames through the ImageIO seam") {
    val frames = Seq(jpegFrame(8, 6, 40), jpegFrame(8, 6, 120), jpegFrame(8, 6, 200))
    val stream = frames.reduce(_ ++ _)
    // fps 0:1 = no timing metadata in the container
    assert(MjpegCodec.probe(stream) == Some((8, 6, 0, 1, 3)))
    // truncated tail: whole frames survive, the cut frame is dropped
    val cut = stream.dropRight(5)
    assert(MjpegCodec.probe(cut) == Some((8, 6, 0, 1, 2)))
    // not-a-JPEG payloads probe to None, never throw
    assert(MjpegCodec.probe("junk payload".getBytes(US_ASCII)).isEmpty)
    assert(MjpegCodec.probe(Array[Byte]()).isEmpty)
  }

  test("MJPEG: per-frame luminance decodes real pixels per sampled frame") {
    val frames = Seq(jpegFrame(4, 4, 30), jpegFrame(4, 4, 130), jpegFrame(4, 4, 230))
    val stream = frames.reduce(_ ++ _)
    for ((lum, idx) <- Seq(30, 130, 230).zipWithIndex) {
      val Some((w, h, plane)) = MjpegCodec.frameLuminance(stream, idx)
      assert((w, h) == ((4, 4)))
      // JPEG is lossy: solid-color frames come back within a few levels
      val mean = plane.map(_ & 0xff).sum.toDouble / plane.length
      assert(math.abs(mean - lum) < 6.0, s"frame $idx mean $mean vs $lum")
    }
    assert(MjpegCodec.frameLuminance(stream, 3).isEmpty)
    // one-pass sampling agrees with per-frame decode
    val onePass = MjpegCodec.frameLuminances(stream, 2)
      .map { case (i, w, h, p) => (i, w, h, p.toSeq) }.toSeq
    assert(onePass.map(_._1) == Seq(0, 2))
    assert(onePass == (0 until 3 by 2).flatMap(i =>
      MjpegCodec.frameLuminance(stream, i).map { case (w, h, p) => (i, w, h, p.toSeq) }))
  }

  test("MJPEG: the same Spark plumbing drives probe and frame stats") {
    val stream = Seq(jpegFrame(8, 6, 60), jpegFrame(8, 6, 180)).reduce(_ ++ _)
    val rows = Seq(
      (1L, stream),
      (2L, "junk payload".getBytes(US_ASCII))).toDF("id", "payload")
    val metas = Video.probeVideos(spark, rows, "id", codec = MjpegCodec).collect()
    assert(metas.map(_.id).toSeq == Seq(1L)) // junk dropped, not crashed
    assert(metas.head.nFrames == 2 && metas.head.width == 8)
    val stats = Video.sampleFrameStats(spark, rows, "id", everyNth = 1,
      codec = MjpegCodec).collect().sortBy(_.frameIdx)
    assert(stats.map(_.frameIdx).toSeq == Seq(0, 1))
    assert(stats(0).brightness < stats(1).brightness) // 60-lum vs 180-lum
  }
}
