package graft

import org.apache.spark.sql.SparkSession

/** Host-attribution instrumentation for [[graft.Bench]] — makes the
  * bench artifact SELF-ATTRIBUTING so a reader can separate co-tenant
  * host noise from a genuine code regression without re-running
  * anything. Motivation: three consecutive grading rounds saw the
  * driver's bench window contaminated by external load (r9: 264.7 s
  * reported vs 88.3 s on a same-code quiet re-run), and each time the
  * attribution had to be re-derived forensically. Now the JSON carries
  * the evidence inline:
  *
  *  - `/proc/loadavg` (1-min field) sampled BEFORE the JVM does any
  *    work (pre-suite — on a quiet dedicated box this is ≈ 0; a large
  *    value means the window was dirty before we ran a single query),
  *    before every query, and after the suite;
  *  - a fixed-shape ~0.3 s canary (range → modulo-key hash aggregate:
  *    pure CPU + one small shuffle, zero data dependence) re-run every
  *    ~20 queries; its time ratio vs the suite-start baseline measures
  *    how much compute the host was actually giving us at that moment;
  *  - a suite-level `host_clean` verdict from both signals.
  *
  * The canary overhead is bounded: ⌈N/20⌉+3 runs ≈ 3 s on a 146-query
  * suite, ~3% — and it is OUTSIDE every per-query timed region.
  */
object BenchHost {

  /** 1-minute load average, or -1.0 where /proc/loadavg is absent
    * (non-Linux) — callers treat negative as "no signal", never as
    * clean or dirty.
    */
  def loadAvg(): Double =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8)
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** One canary execution: fixed row count, fixed key cardinality,
    * fixed partitioning — the plan, codegen, and data never change, so
    * after the baseline is taken the ONLY remaining variable is how
    * much of the machine the scheduler gives this JVM.
    */
  def canarySec(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0L, 20000000L, 1L, 8)
      .selectExpr("id % 9973 AS k", "id AS v")
      .groupBy(col("k")).agg(sum(col("v"))).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** One I/O canary execution: a fixed full-column-pruned parquet
    * scan + sum aggregate over the SF directory's lineitem table —
    * the same file every time, so after the first run primes codegen
    * and the OS page cache, the remaining variables are exactly the
    * ones the CPU canary is blind to: I/O bandwidth, page-cache
    * eviction pressure, and memory-bandwidth contention (the
    * q_semdedup-7.3×-under-a-clean-CPU-canary blind spot, rounds
    * 8-12). Interpreted like [[canarySec]]: normalized against its
    * own in-suite median, with the same dirty thresholds.
    */
  def ioCanarySec(spark: SparkSession, sfDir: String): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(sum(col("l_extendedprice")), sum(col("l_quantity")),
        count(lit(1))).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Suite-start I/O baseline: best of `n` — the first run pays file
    * listing, footer reads, codegen, and the cold page cache, which
    * min() discards. Like [[canaryBase]], context only, never the
    * normalization reference.
    */
  def ioCanaryBase(spark: SparkSession, sfDir: String, n: Int = 3): Double =
    (1 to n).map(_ => ioCanarySec(spark, sfDir)).min

  /** One QUIET-GAP canary sample — the in-suite sampling discipline
    * (r14 pressure-harness findings, both failure modes):
    *
    *  1. at sf1 the suite saturates all 32 threads for minutes and
    *     leaves the JVM carrying GC debt + cleaner backlog at every
    *     between-query point, so a bare canary there measures the
    *     SUITE'S OWN wake (ratios 2.4-3.0 vs fresh) and no sf1 epoch
    *     could ever read host_clean — a workload-correlated false
    *     dirty. The enforced gap (one GC + a short drain sleep) lets
    *     the cleaner/writeback wake pass so the sample measures what
    *     the HOST is giving this JVM, which is the only thing the
    *     gate is about;
    *  2. best-of-2 discards a one-off GC pause or scheduler blip
    *     landing inside a 0.3 s sample — the same min() rationale as
    *     [[canaryBase]], applied per sample.
    *
    * The gap is ADAPTIVE: after the GC + drain, samples repeat (up to
    * 4) until two consecutive ones agree within 25%, with a longer
    * drain before each extra attempt — "sample when the machine is
    * quiet", not "sample on a fixed schedule and hope". Rationale: at
    * sf1 a fixed 150 ms drain is not enough after a 70 s query that
    * spilled 7 GB (shuffle-file cleanup and writeback outlast it),
    * and both r15 sf1 windows were verdicted dirty by exactly one
    * such canary pair (1.8-2.2× a now-halved median) while the
    * absolute gate read clean. An UNSTABLE final state still returns
    * the min — a genuinely contended host stays slow across attempts
    * and the gates still fire.
    *
    * Cost: ~13 GCs + a few seconds of drain per 266-query suite, all
    * OUTSIDE the per-query timed regions.
    */
  def quietCanarySec(spark: SparkSession): Double = {
    System.gc()
    Thread.sleep(150)
    var prev = canarySec(spark)
    var best = prev
    var attempts = 1
    var stable = false
    while (!stable && attempts < 4) {
      val cur = canarySec(spark)
      best = math.min(best, cur)
      stable = math.max(cur, prev) <= 1.25 * math.min(cur, prev)
      prev = cur
      attempts += 1
      if (!stable && attempts < 4) Thread.sleep(250L * attempts)
    }
    best
  }

  /** Quiet-gap I/O canary: same gap discipline as [[quietCanarySec]]
    * (the gap is shared when both are sampled back-to-back — callers
    * run quietCanarySec first, then this, without re-sleeping).
    */
  def ioCanaryBest2(spark: SparkSession, sfDir: String): Double =
    math.min(ioCanarySec(spark, sfDir), ioCanarySec(spark, sfDir))

  /** Suite-start baseline: best of `n` (the first run additionally
    * pays the canary's own codegen, which min() discards).
    *
    * NOT the normalization reference for in-suite ratios: a fresh
    * small-heap JVM runs the canary 1.4-1.9× faster than the same JVM
    * mid-suite (heap grown to the bench working set, GC debt, JIT
    * state), so normalizing against this value flags every honest
    * epoch as dirty — measured on three quiet-window epochs whose
    * mid-suite canaries sat at a UNIFORM ~1.5× of the fresh baseline
    * with totals within ±2%. Bench uses [[median]] of the in-suite
    * series instead; this baseline's remaining jobs are paying the
    * canary's codegen before the suite and serving as the CPU-
    * sensitivity reference in BenchHostSpec.
    */
  def canaryBase(spark: SparkSession, n: Int = 3): Double =
    (1 to n).map(_ => canarySec(spark)).min

  /** Median of the in-suite canary series — the normalization
    * reference: uniform JVM-state drift cancels exactly (every ratio
    * ≈ 1), while a transient co-tenant window shows as its canaries
    * ≫ median (the r9 contamination measured 3-90×, far past the
    * 1.5 threshold; a sustained-for-the-whole-suite intruder is the
    * pre-suite loadavg gate's job, not the canary's).
    */
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of nothing")
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** A canary slower than this ratio vs the in-suite MEDIAN marks the
    * surrounding window dirty. 1.5 sits well above same-host jitter
    * (repeat canaries on a quiet box stay within ~1.2×) and well below
    * the 3-90× swings measured on contaminated driver windows.
    */
  val CanaryDirtyRatio = 1.5

  /** Second, ABSOLUTE gate vs the fresh-JVM baseline: the median gate
    * alone is blind to contamination that arrives just after suite
    * start and persists (it inflates the median itself, every ratio
    * reads ~1). Clean mid-suite canaries measure ≤1.9× the fresh
    * baseline (JVM heap/GC/JIT drift — see [[canaryBase]]); the bound
    * sits just above that measured envelope so a sustained co-tenant
    * adding even ~15-30% trips it, instead of the former 2.5 whose
    * 1.9-2.5 blind band admitted a ~30%-inflated "clean" epoch.
    *
    * The DENOMINATOR is [[absGateRef]], not the raw fresh sample: on
    * an idle host the fresh canary turbo-boosts ~20-30% below loaded
    * single-thread speed (r14 measured 0.207-0.235 s idle vs
    * 0.26-0.30 s loaded), which shrank the denominator and verdicted
    * three otherwise-clean r14 windows dirty on this gate ALONE.
    */
  val CanaryAbsDirtyRatio = 2.1

  /** Reference value for the absolute gate, shielded BOTH ways:
    *
    *  - an idle-turbo own sample (LOW — the r14 false-dirty class)
    *    is floored by the committed anchor's vetted fresh value;
    *  - a loaded-start own sample (HIGH — measured this round: a
    *    window whose JVM start overlapped background drain read
    *    fresh = 1.62 s vs the honest ~0.25 s, which under a plain
    *    max() would blind the sustained-intruder gate entirely) is
    *    CAPPED at 1.3× the anchor — genuine hardware drift passes,
    *    a polluted sample cannot raise the bar.
    *
    * A missing anchor (or an anchor without the field) degrades to
    * the own sample, never to a rejected gate.
    */
  def absGateRef(ownFresh: Double, anchorFresh: Option[Double]): Double =
    anchorFresh match {
      case Some(a) => math.max(a, math.min(ownFresh, 1.3 * a))
      case None => ownFresh
    }

  /** Pre-suite load above this fraction of the core count means the
    * box was busy before the bench contributed anything.
    */
  val PreSuiteLoadFrac = 0.25

  /** An I/O canary slower than this ratio vs its own in-suite median
    * marks the window dirty. Looser than the CPU canary's 1.5: a
    * parquet scan's time carries page-cache state and file-system
    * jitter that repeat scans on a quiet box already move ~1.4×, so
    * the gate sits above honest jitter while still catching the
    * multi-× I/O stalls that left q_semdedup 7.3× slow under a clean
    * CPU canary (r12).
    */
  val IoCanaryDirtyRatio = 2.0

  /** The suite verdict: clean iff the box was idle when we started
    * (no signal counts as unknown-but-not-dirty), every canary ran at
    * its in-suite-median speed (transient-spike gate), no canary
    * exceeded the absolute fresh-baseline bound (sustained-intruder
    * gate — see [[CanaryAbsDirtyRatio]]), and every I/O canary ran at
    * its own median speed (I/O-contention gate). Pass absRatios /
    * ioRatios empty to skip those gates.
    */
  def hostClean(loadPreSuite: Double, cpus: Int,
      canaryRatios: Seq[Double],
      absRatios: Seq[Double] = Seq.empty,
      ioRatios: Seq[Double] = Seq.empty): Boolean =
    (loadPreSuite < 0 || loadPreSuite <= PreSuiteLoadFrac * cpus) &&
      canaryRatios.forall(_ <= CanaryDirtyRatio) &&
      absRatios.forall(_ <= CanaryAbsDirtyRatio) &&
      ioRatios.forall(_ <= IoCanaryDirtyRatio)

  /** Conservative per-query attribution: a query inherits the WORST
    * ratio of the canaries bracketing it (the last one at-or-before
    * its position and the first one after) — contention anywhere in
    * its neighborhood flags it, so a flagged per-query number is
    * never silently trusted.
    */
  def ratioForQuery(queryIdx: Int,
      canaries: Seq[(Int, Double)]): Double = {
    val before = canaries.filter(_._1 < queryIdx).map(_._2)
    val after = canaries.filter(_._1 >= queryIdx).map(_._2)
    math.max(before.lastOption.getOrElse(1.0),
      after.headOption.getOrElse(1.0))
  }
}
