package graft.multimodal

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Real-codec adapter through the SAME distributed plumbing as the
  * stub (round-5 advice item 7): actual PNG bytes, encoded in-test via
  * `javax.imageio`, decoded and resized by [[Multimodal.ImageIoCodec]]
  * inside the mapPartitions boundary — proving the codec seam is real,
  * not a stub-shaped hole.
  */
class ImageIoCodecSpec extends SparkSpec {
  import spark.implicits._

  /** A w×h PNG: left half rgb(100,150,200) (lum 150), right half
    * rgb(30,60,90) (lum 60).
    */
  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) (100 << 16) | (150 << 8) | 200
                       else (30 << 16) | (60 << 8) | 90)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("perceptual hash: identical images collide, halves-image splits bits") {
    val rows = Seq(
      (1L, png(16, 16)), (2L, png(16, 16)),  // identical → same hash
      (3L, "definitely not an image".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val got = Multimodal.perceptualHash(spark, rows, "id",
      codec = Multimodal.ImageIoCodec).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet === Set(1L, 2L)) // undecodable payload dropped
    assert(got(1L) === got(2L))
    assert(got(1L).length == 64)
    // bright left half above the mean, dark right half below: each
    // 8-char row of the hash is half ones, half zeros
    assert(got(1L).grouped(8).forall(row =>
      row.count(_ == '1') == 4 && row.take(4).forall(_ == '1')))
  }

  test("decodeFeatures reads real PNG dimensions and brightness; garbage rows drop") {
    val rows = Seq(
      (1L, png(8, 6)),
      (2L, png(4, 4)),
      (3L, "definitely not an image".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val got = Multimodal.decodeFeatures(spark, rows, "id",
      codec = Multimodal.ImageIoCodec).collect().map(f => f.id -> f).toMap
    assert(got.keySet === Set(1L, 2L)) // undecodable payload dropped
    val f1 = got(1L)
    assert((f1.width, f1.height, f1.channels) === ((8, 6, 3)))
    // half the pixels lum 150, half lum 60 → mean 105 → 105/255
    assert(f1.brightness === math.floor(105.0 / 255.0 * 1e6 + 0.5) / 1e6)
    assert(f1.byteLen === png(8, 6).length)
  }

  test("resize samples real pixels nearest-neighbor through the same boundary") {
    val rows = Seq((1L, png(8, 8))).toDF("id", "payload")
    val out = Multimodal.resize(spark, rows, "id", outW = 2, outH = 2,
      codec = Multimodal.ImageIoCodec).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.srcW, r.srcH, r.outW, r.outH) === ((8, 8, 2, 2)))
    // nearest-neighbor at (0,0),(4,0),(0,4),(4,4): columns 0 and 4 →
    // left half lum 150, right half lum 60
    assert(r.resized.toSeq === Seq(150.toByte, 60.toByte, 150.toByte, 60.toByte))
    assert(r.checksum === 150L + 60L + 150L + 60L)
  }

  test("the stub and the real codec share one contract (FakeCodec still total)") {
    // the same frame through the DEFAULT codec keeps every row — the
    // oracle-gated queries rely on FakeCodec's totality
    val rows = Seq(
      (1L, png(8, 6)),
      (3L, "definitely not an image".getBytes("UTF-8"))
    ).toDF("id", "payload")
    assert(Multimodal.decodeFeatures(spark, rows, "id").count() === 2)
  }
}
