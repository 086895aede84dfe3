package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ByteDedupSpec extends SparkSpec {
  import spark.implicits._

  private def randBytes(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(256).toByte)
  }

  private def chunksOf(b: Array[Byte]): Seq[(Long, Long, Long)] =
    Seq(Tuple1(b)).toDF("payload")
      .select(explode(ByteDedup.gearChunks($"payload", maskBits = 8,
        minSize = 16, maxSize = 1024)).as("c"))
      .select($"c.offset", $"c.len", $"c.hash")
      .as[(Long, Long, Long)].collect().toSeq

  test("chunks tile the payload exactly; sizes respect the clamps") {
    val b = randBytes(20000, seed = 1)
    val cs = chunksOf(b)
    assert(cs.map(_._2).sum === 20000L)
    assert(cs.head._1 === 0L)
    cs.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 === o2)
      case _ =>
    }
    // every chunk except possibly the last respects [min, max]
    cs.init.foreach { case (_, l, _) => assert(l >= 16 && l <= 1024) }
    assert(cs.size > 10, "mask 8 over 20k random bytes must cut often")
  }

  test("shift resilience: an insertion leaves later chunks identical") {
    val base = randBytes(30000, seed = 2)
    val shifted = randBytes(137, seed = 3) ++ base // insert at the front
    val a = chunksOf(base).map(_._3)
    val b = chunksOf(shifted).map(_._3)
    // after the rolling hash re-synchronizes, the chunk-hash STREAMS
    // coincide: the entire tail of `a` reappears verbatim in `b`
    val overlap = a.toSet.intersect(b.toSet).size
    assert(overlap >= a.size - 3,
      s"only $overlap of ${a.size} chunks survived a 137-byte insertion")
    // the fixed-size strawman loses everything: no 1KB block of the
    // shifted payload matches any block of the base
    val fixedA = base.grouped(1024).map(_.toSeq).toSet
    val fixedB = shifted.grouped(1024).map(_.toSeq).toSet
    assert(fixedA.intersect(fixedB).isEmpty)
  }

  test("dedup report: shared regions attribute to the first owner") {
    val shared = randBytes(8000, seed = 4)
    val rows = Seq(
      (1L, shared ++ randBytes(2000, 5)),
      (2L, randBytes(500, 6) ++ shared), // same region, shifted
      (3L, randBytes(4000, 7)))          // unrelated
    val out = ByteDedup.chunkDedupReport(
        rows.toDF("doc_id", "payload"), "doc_id", "payload",
        maskBits = 8, minSize = 16, maxSize = 1024)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._4 === 0L) // first owner shares nothing backwards
    // doc 2 recovers most of the 8000 shared bytes despite the shift
    assert(out(2L)._4 > 6000L, s"doc2 dup_bytes = ${out(2L)._4}")
    assert(out(3L)._4 === 0L)
    // byte totals are conserved per doc
    assert(out(1L)._2 === 10000L && out(2L)._2 === 8500L)
  }

  test("deterministic across runs and partitionings; empty payload is empty") {
    val rows = (1L to 40L).map(i => (i, randBytes(3000, i)))
    val a = ByteDedup.chunkDedupReport(rows.toDF("doc_id", "payload"),
      "doc_id", "payload").as[(Long, Long, Long, Long)].collect().toSet
    val b = ByteDedup.chunkDedupReport(
      rows.toDF("doc_id", "payload").repartition(7),
      "doc_id", "payload").as[(Long, Long, Long, Long)].collect().toSet
    assert(a === b)
    val empty = ByteDedup.chunkDedupReport(
      Seq((1L, Array.emptyByteArray)).toDF("doc_id", "payload"),
      "doc_id", "payload").as[(Long, Long, Long, Long)].head()
    assert(empty === ((1L, 0L, 0L, 0L)))
  }
}
