package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 6 // 64×64 grid → 4096 cells, exhaustive checks

  test("hilbert walk is a bijection onto 0..4^bits-1") {
    val n = 1 << bits
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield Hilbert.hilbertD(x, y, bits)
    assert(ds.sorted === (0L until (n.toLong * n)))
  }

  test("consecutive hilbert keys are always Manhattan-adjacent; Morton jumps") {
    val n = 1 << bits
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield Hilbert.hilbertD(x, y, bits) -> ((x, y))).toMap
    val hJumps = (1 until n * n).map { d =>
      val (x0, y0) = byD(d - 1L); val (x1, y1) = byD(d.toLong)
      math.abs(x1 - x0) + math.abs(y1 - y0)
    }
    assert(hJumps.max === 1, "the defining Hilbert property: no long jumps")
    // Morton on the same grid jumps across the grid at block boundaries
    def morton(x: Int, y: Int) = (0 until bits).map(i =>
      (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    val byZ = (for (x <- 0 until n; y <- 0 until n)
      yield morton(x, y) -> ((x, y))).toMap
    val zJumps = (1 until n * n).map { z =>
      val (x0, y0) = byZ(z - 1); val (x1, y1) = byZ(z)
      math.abs(x1 - x0) + math.abs(y1 - y0)
    }
    assert(zJumps.max >= n / 2, "Morton's long jumps are what Hilbert removes")
  }

  test("native expression equals the JVM kernel and stays in codegen") {
    val pts = Seq((3L, 5L), (0L, 0L), (65535L, 65535L), (12345L, 54321L))
      .toDF("x", "y")
    val viaExpr = pts.select(Hilbert.hValue($"x", $"y")).as[Long].collect()
    val viaKernel = Seq((3L, 5L), (0L, 0L), (65535L, 65535L), (12345L, 54321L))
      .map { case (x, y) => Hilbert.hilbertD(x, y, Hilbert.Bits) }
    assert(viaExpr.toSeq === viaKernel)
    // LocalTableScan never codegens — check on a range scan instead
    val plan = spark.range(0, 4096)
      .select(Hilbert.hValue($"id" % 64, $"id" / 64))
      .queryExecution.executedPlan.toString
    // the "*(1)" prefix is the WholeStageCodegen marker in toString
    assert(plan.contains("*(1) Project"), s"fell out of codegen:\n$plan")
  }

  test("nulls propagate; sortByH lays out contiguous key ranges per partition") {
    val withNull = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
    assert(withNull.select(Hilbert.hValue($"x", $"y"))
      .collect().head.isNullAt(0))
    val df = (0 until 2000).map(i => (i % 64, (i * 7) % 64)).toDF("x", "y")
    val laid = Hilbert.sortByH(df, "x", "y", partitions = 4)
    // per-partition h ranges must not overlap (range partitioning) and
    // rows are sorted within each partition
    val parts = laid.select($"h")
      .withColumn("p", spark_partition_id())
      .as[(Long, Int)].collect().groupBy(_._2).values.toSeq
      .map(a => (a.map(_._1).min, a.map(_._1).max, a.map(_._1).toSeq))
    parts.foreach { case (_, _, hs) => assert(hs === hs.sorted) }
    val ranges = parts.map(p => (p._1, p._2)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }

  test("MEASURED on parquet: Hilbert layout skips more row groups than " +
    "Z-order on box queries (footer min/max envelopes)") {
    import java.nio.file.Files
    // full 512×512 grid (262,144 points), arrival order scrambled by a
    // multiplicative hash so neither layout inherits pre-sorted luck
    val side = 512L
    val pts = (0L until side * side).map { i =>
      val s = (i * 2654435761L) % (side * side)
      (s % side, s / side)
    }
    val df = pts.toDF("x", "y")
    val parts = 64
    val dirH = Files.createTempDirectory("graft-layout-h").toString
    val dirZ = Files.createTempDirectory("graft-layout-z").toString
    Hilbert.sortByH(df, "x", "y", parts).drop("h")
      .write.mode("overwrite").parquet(dirH)
    ZOrder.sortByZ(df, "x", "y", parts).drop("z")
      .write.mode("overwrite").parquet(dirZ)
    val envH = LayoutAudit.rowGroupEnvelopes(spark, dirH, "x", "y")
    val envZ = LayoutAudit.rowGroupEnvelopes(spark, dirZ, "x", "y")
    // both layouts materialized the same corpus over the same number
    // of range partitions — the comparison is envelope quality only
    assert(envH.map(_._5).sum === side * side)
    assert(envZ.map(_._5).sum === side * side)
    // 24 deterministic 32×32 box queries spread across the grid
    val boxes = (0 until 24).map { q =>
      val x0 = (q * 97L) % (side - 32)
      val y0 = (q * 211L) % (side - 32)
      (x0, x0 + 31, y0, y0 + 31)
    }
    def mustRead(envs: Seq[(Long, Long, Long, Long, Long)]) = boxes.map {
      case (x0, x1, y0, y1) =>
        LayoutAudit.mustReadGroups(envs, x0, x1, y0, y1)
    }
    val readH = mustRead(envH)
    val readZ = mustRead(envZ)
    // the Hilbert claim, measured where it matters: fewer row groups
    // fetched in total, and never more than Z-order needs on any box
    assert(readH.sum < readZ.sum,
      s"hilbert=${readH.sum} zorder=${readZ.sum} of ${envH.size} groups × 24")
    info(s"box queries: hilbert must-read ${readH.sum}, " +
      s"zorder ${readZ.sum}, total groups ${envH.size} × 24 queries")
    // full-width band queries — where Morton's row-major bias can win;
    // reported for the SCALE.md table, not asserted as an advantage
    val bands = (0 until 8).map { q =>
      val y0 = (q * 61L) % (side - 16); (0L, side - 1, y0, y0 + 15)
    }
    val bandH = bands.map { case (x0, x1, y0, y1) =>
      LayoutAudit.mustReadGroups(envH, x0, x1, y0, y1) }.sum
    val bandZ = bands.map { case (x0, x1, y0, y1) =>
      LayoutAudit.mustReadGroups(envZ, x0, x1, y0, y1) }.sum
    info(s"band queries: hilbert must-read $bandH, zorder $bandZ")
  }
}
