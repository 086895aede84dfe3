package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly") {
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 3L, 14L), (65535L, 65535L, (1L << 32) - 1),
      (65536L, 0L, 0L)) // out-of-range bits are masked off
    val out = cases.map(c => (c._1, c._2)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y")).as[Long].collect()
    assert(out.toSeq == cases.map(_._3))
  }

  test("strict zValue fails on out-of-domain coordinates instead of wrapping") {
    // lax mode masks: 65536 collides with 0. strict mode must surface
    // the collision as an error, not a silently degraded layout.
    val ok = Seq((65535L, 0L)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", strict = true)).as[Long].collect()
    assert(ok.head === 0x55555555L) // x bits land on even positions
    val err = intercept[Exception] {
      Seq((65536L, 0L)).toDF("x", "y")
        .select(ZOrder.zValue($"x", $"y", strict = true)).collect()
    }
    assert(err.getMessage.contains("quantize") ||
      Option(err.getCause).exists(_.getMessage.contains("quantize")))
    val neg = intercept[Exception] {
      Seq((-1L, 0L)).toDF("x", "y")
        .select(ZOrder.zValue($"x", $"y", strict = true)).collect()
    }
    assert(neg.getMessage.contains("quantize") ||
      Option(neg.getCause).exists(_.getMessage.contains("quantize")))
    // NULL coordinates pass through as NULL z (the lax behavior), even
    // in strict mode — only non-null out-of-domain values raise; and a
    // mixed null/out-of-range row still prints the diagnostic
    val withNull = Seq((Some(3L), Option.empty[Long]))
      .toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", strict = true)).collect()
    assert(withNull.head.isNullAt(0))
    val mixed = intercept[Exception] {
      Seq((Option.empty[Long], Some(70000L))).toDF("x", "y")
        .select(ZOrder.zValue($"x", $"y", strict = true)).collect()
    }
    assert(mixed.getMessage.contains("x=NULL") ||
      Option(mixed.getCause).exists(_.getMessage.contains("x=NULL")))
  }

  test("z-sorted partitions have bounded per-dimension extent") {
    // a uniform 32x32 grid z-sorted into 4 range partitions: each
    // partition must cover a localized region of BOTH dims — the
    // property that makes min/max stats prune on either column. A
    // single-column sort would leave the second dim at full range in
    // every partition.
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y))
      .toDF("x", "y")
    val parts = ZOrder.sortByZ(grid, "x", "y", partitions = 4)
      .select(spark_partition_id().as("p"), $"x", $"y")
      .groupBy($"p")
      .agg((max($"x") - min($"x")).as("xr"), (max($"y") - min($"y")).as("yr"))
      .collect()
    assert(parts.length === 4)
    // global range is 31; a quadrant is 15-16. Range-sampling blurs the
    // boundaries, so allow up to 24 — still far below full range.
    parts.foreach { r =>
      assert(r.getAs[Int]("xr") <= 24 && r.getAs[Int]("yr") <= 24,
        s"partition spans too much: $r")
    }
  }
}
