package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileHistSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private val lo = 0.0
  private val hi = 600.0
  private val nBins = 64
  private val width = (hi - lo) / nBins

  test("counter table is bounded and conserves mass") {
    val ctr = QuantileHist.counters(docs, Seq("source"), "n_chars", lo, hi, nBins)
    val over = ctr.groupBy("source").agg(count(lit(1)).as("rows"))
      .filter(col("rows") > nBins)
    assert(over.count() === 0)
    val mass = ctr.agg(sum(col("cnt"))).head().getLong(0)
    assert(mass === docs.filter(col("n_chars").isNotNull).count())
  }

  test("counters merge by addition: split-and-merge equals whole") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val merged = QuantileHist.counters(a, Seq("source"), "n_chars", lo, hi, nBins)
      .unionByName(QuantileHist.counters(b, Seq("source"), "n_chars", lo, hi, nBins))
      .groupBy(col("source"), col("qh_bin"))
      .agg(sum(col("cnt")).as("cnt"))
    val whole = QuantileHist.counters(docs, Seq("source"), "n_chars", lo, hi, nBins)
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
  }

  test("topFraction keeps ~the requested share, always the highest values") {
    val vals = (1 to 4000).map(i => (i.toLong, (i % 1000) / 1000.0))
      .toDF("id", "score")
    val kept = QuantileHist.topFraction(vals, "score",
      frac = 0.25, lo = 0.0, hi = 1.0, nBins = 256)
    val n = kept.count()
    // bin-width-bounded accuracy around 25% of 4000
    assert(math.abs(n - 1000.0) / 1000 < 0.05, s"kept $n")
    // the kept set is exactly a top segment: its minimum exceeds the
    // maximum of the dropped rows (values are dense so ties aside)
    val minKept = kept.agg(min(col("score"))).head().getDouble(0)
    val maxDropped = vals.join(kept.select(col("id")), Seq("id"), "left_anti")
      .agg(max(col("score"))).head().getDouble(0)
    assert(minKept > maxDropped)
    // frac = 1.0 keeps everything
    assert(QuantileHist.topFraction(vals, "score", 1.0, 0.0, 1.0, 256)
      .count() === 4000L)
    // regression pin: a corpus whose minimum sits EXACTLY on a bin
    // edge (3/256 = 0.01171875) — 6-dp display rounding of the
    // threshold would round it UP to 0.011719 and drop every row;
    // the gate must use the unrounded interpolated cutoff
    val edge = (1L to 100L).map(i => (i, 3.0 / 256)).toDF("id", "score")
    assert(QuantileHist.topFraction(edge, "score", 1.0, 0.0, 1.0, 256)
      .count() === 100L)
  }

  test("topFractionByGroup budgets each group independently") {
    // two groups with disjoint score ranges: a GLOBAL top-25% gate
    // would keep only group b rows; the per-group gate must keep
    // ~25% of EACH group
    val vals = ((1 to 2000).map(i => ("a", i.toLong, (i % 500) / 2000.0)) ++
      (1 to 2000).map(i => ("b", 10000L + i, 0.5 + (i % 500) / 2000.0)))
      .toDF("grp", "id", "score")
    val kept = QuantileHist.topFractionByGroup(vals, Seq("grp"), "score",
      frac = 0.25, lo = 0.0, hi = 1.0, nBins = 256)
    val byGrp = kept.groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.keySet === Set("a", "b"))
    byGrp.foreach { case (g, n) =>
      assert(math.abs(n - 500.0) / 500 < 0.06, s"group $g kept $n")
    }
    // within each group the kept set is a top segment
    for (g <- Seq("a", "b")) {
      val k = kept.filter(col("grp") === g)
      val minKept = k.agg(min(col("score"))).head().getDouble(0)
      val maxDropped = vals.filter(col("grp") === g)
        .join(k.select(col("id")), Seq("id"), "left_anti")
        .agg(max(col("score"))).head().getDouble(0)
      assert(minKept > maxDropped, s"group $g not a top segment")
    }
  }

  test("winsorize clamps into the per-group quantile band, keeps every row") {
    val out = QuantileHist.winsorize(
      docs.select($"doc_id", $"source", $"n_chars"),
      Seq("source"), "n_chars", lo, hi, nBins, pLo = 0.05, pHi = 0.95)
    assert(out.count() === docs.count()) // layout-only: no row drops
    // bands per source, recomputed independently
    val bands = QuantileHist.quantiles(docs, Seq("source"), "n_chars",
      lo, hi, nBins, Seq(0.05, 0.95))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val rows = out.select($"source", $"n_chars", $"n_chars_w")
      .as[(String, Long, Double)].collect()
    rows.foreach { case (src, v, w) =>
      val (bLo, bHi) = (bands((src, 0.05)), bands((src, 0.95)))
      assert(w >= bLo - 1e-9 && w <= bHi + 1e-9, s"$src: $w outside band")
      // interior values untouched, outliers clamped to the nearer bound
      if (v >= bLo && v <= bHi) assert(w === v.toDouble)
      else assert(w === (if (v < bLo) bLo else bHi))
    }
    // something was actually clamped on both sides at p05/p95
    assert(rows.exists { case (_, v, w) => w > v }, "no low clamp happened")
    assert(rows.exists { case (_, v, w) => w < v }, "no high clamp happened")
  }

  test("estimates are monotone in q and within one bin of the exact quantile") {
    val est = QuantileHist.quantiles(docs, Seq("source"), "n_chars",
      lo, hi, nBins, Seq(0.5, 0.9, 0.99))
      .groupBy("source").pivot("q", Seq("0.5", "0.9", "0.99")).agg(first("est"))
      .toDF("source", "p50e", "p90e", "p99e")
    val bad = est.filter(col("p50e") > col("p90e") || col("p90e") > col("p99e"))
    assert(bad.count() === 0)
    val exact = docs.groupBy("source")
      .agg(expr("percentile(n_chars, 0.5)").as("p50"))
    val joined = est.join(exact, "source")
      .filter(abs(col("p50e") - col("p50")) > width)
    assert(joined.count() === 0)
  }
}
