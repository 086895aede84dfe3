package graft.multimodal

import graft.SparkSpec

class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  /** Build a real 16-bit PCM WAV: sine at `amp` (0..1), `rate` Hz. */
  private def wav(rate: Int, channels: Int, nFrames: Int,
      amp: Double): Array[Byte] = {
    val dataLen = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * channels * 2); bb.putShort((channels * 2).toShort)
    bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    for (i <- 0 until nFrames; _ <- 0 until channels)
      bb.putShort((math.sin(2 * math.Pi * 440 * i / rate) * amp * 32767).toShort)
    bb.array()
  }

  test("probe reads RIFF/PCM geometry; sine loudness lands at amp/√2") {
    val bytes = wav(rate = 8000, channels = 2, nFrames = 8000, amp = 0.5)
    val meta = Audio.WavCodec.probe(bytes).get
    assert(meta === Audio.AudioMeta(8000, 2, 16, 8000))
    assert(meta.durationMs === 1000L)
    val (_, rms, peak) = Audio.WavCodec.loudness(bytes).get
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(peak - 0.5) < 0.01)
  }

  test("corrupt and foreign payloads degrade to None, never throw") {
    assert(Audio.WavCodec.probe("not audio at all".getBytes).isEmpty)
    assert(Audio.WavCodec.probe(Array.emptyByteArray).isEmpty)
    // truncated data section clamps to the bytes present
    val full = wav(8000, 1, 1000, 0.3)
    val cut = full.take(44 + 100)
    assert(Audio.WavCodec.probe(cut).get.nFrames === 50L)
    // crafted chunk length past the end is rejected or clamped, not read
    val evil = full.clone()
    val bb = java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue) // declared data size
    assert(Audio.WavCodec.probe(evil).get.nFrames === 1000L)
    // float-PCM / other formats are not this codec's job
    val f32 = full.clone(); java.nio.ByteBuffer.wrap(f32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(20, 3)
    assert(Audio.WavCodec.probe(f32).isEmpty)
  }

  test("audioFeatures seam drops junk rows and keeps decodable ones") {
    val rows = Seq(
      (1L, wav(16000, 1, 16000, 0.8)),
      (2L, "junk-payload".getBytes),
      (3L, wav(8000, 2, 4000, 0.2)))
    val out = Audio.audioFeatures(spark, rows.toDF("doc_id", "payload"),
      "doc_id").as[Audio.AudioFeature].collect().map(f => f.id -> f).toMap
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L).sample_rate === 16000 && out(1L).duration_ms === 1000L)
    assert(out(3L).channels === 2 && out(3L).duration_ms === 500L)
    assert(math.abs(out(1L).rms - 0.8 / math.sqrt(2)) < 0.01)
  }
}
