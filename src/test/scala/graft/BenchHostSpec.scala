package graft

/** Pins the bench's host-attribution instrumentation: the loadavg
  * probe, the bracketing per-query attribution rule, the host_clean
  * verdict logic, and — the load-bearing one — that a synthetically
  * loaded CPU actually drives the canary ratio past the dirty
  * threshold (i.e. the annotation FIRES when the host is busy, which
  * is the whole point of making the artifact self-attributing).
  */
class BenchHostSpec extends SparkSpec {

  test("loadavg probe returns a real non-negative sample on linux") {
    val l = BenchHost.loadAvg()
    assert(l >= 0.0, s"/proc/loadavg should parse on this platform: $l")
    assert(l < 10000.0)
  }

  test("host_clean verdict composes the pre-suite load and canary signals") {
    // idle box, flat canaries → clean
    assert(BenchHost.hostClean(0.1, 32, Seq(1.0, 1.1, 0.95)))
    // busy BEFORE the suite started → dirty even with flat canaries
    assert(!BenchHost.hostClean(20.0, 32, Seq(1.0)))
    // any canary past the threshold → dirty
    assert(!BenchHost.hostClean(0.1, 32, Seq(1.0, 2.4, 1.0)))
    // probe unavailable (-1) is "no signal", not dirty
    assert(BenchHost.hostClean(-1.0, 32, Seq(1.0)))
    assert(!BenchHost.hostClean(-1.0, 32, Seq(1.0, 5.0)))
  }

  test("per-query attribution takes the worst bracketing canary") {
    val canaries = Seq((20, 1.0), (40, 3.0), (60, 1.1))
    // query 25 sits between the clean q20 canary and the dirty q40 one
    assert(BenchHost.ratioForQuery(25, canaries) === 3.0)
    // query 45: bracketed by dirty-before (3.0) and clean-after (1.1)
    assert(BenchHost.ratioForQuery(45, canaries) === 3.0)
    // query 5: nothing before, clean canary after
    assert(BenchHost.ratioForQuery(5, canaries) === 1.0)
    // query 70: dirty window long past — clean brackets only
    assert(BenchHost.ratioForQuery(70, canaries) === 1.1)
    assert(BenchHost.ratioForQuery(1, Seq.empty) === 1.0)
  }

  test("median normalization: uniform JVM drift is clean, a spike is not") {
    // three quiet-window epochs measured mid-suite canaries at a
    // UNIFORM ~1.5x of the fresh-JVM baseline (heap/GC/JIT state, not
    // contention) — normalized against their own median they must
    // read clean, while a genuine transient spike still fires
    val drifted = Seq(0.34, 0.36, 0.33, 0.35, 0.37, 0.34)
    val med = BenchHost.median(drifted)
    assert(drifted.map(_ / med).forall(_ <= BenchHost.CanaryDirtyRatio))
    assert(BenchHost.hostClean(0.1, 32, drifted.map(_ / med)))
    val spiked = drifted :+ 0.95 // one co-tenant window
    val medS = BenchHost.median(spiked)
    assert(spiked.map(_ / medS).max > BenchHost.CanaryDirtyRatio)
    assert(!BenchHost.hostClean(0.1, 32, spiked.map(_ / medS)))
    // median basics
    assert(BenchHost.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(BenchHost.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
  }

  test("absolute gate catches sustained contamination the median misses") {
    // intruder lands after the first canary and persists: the median
    // itself is contaminated, every median-ratio reads ~1 (the early
    // clean canary reads LOW, which the ≤ threshold ignores) — the
    // median gate alone would stamp this run clean
    val fresh = 0.235
    val secs = Seq(0.24, 0.72, 0.75, 0.70, 0.74, 0.73, 0.71)
    val med = BenchHost.median(secs)
    val medRatios = secs.map(_ / med)
    assert(medRatios.forall(_ <= BenchHost.CanaryDirtyRatio))
    assert(BenchHost.hostClean(0.1, 32, medRatios))
    // …but vs the fresh baseline the sustained 3× intruder is plain
    assert(!BenchHost.hostClean(0.1, 32, medRatios, secs.map(_ / fresh)))
    // clean JVM drift (≤1.9× fresh, flat) passes BOTH gates
    val drift = Seq(0.34, 0.36, 0.33, 0.35, 0.37)
    val dm = BenchHost.median(drift)
    assert(BenchHost.hostClean(0.1, 32, drift.map(_ / dm),
      drift.map(_ / fresh)))
    // the former 2.5 bound's blind band (1.9-2.5× fresh): a sustained
    // co-tenant stacking ~20% on top of honest 1.9× JVM drift sits at
    // ~2.3× fresh with flat median ratios — it must read dirty now
    val band = Seq(0.54, 0.53, 0.55, 0.54, 0.53)
    val bm = BenchHost.median(band)
    assert(band.map(_ / bm).forall(_ <= BenchHost.CanaryDirtyRatio))
    assert(!BenchHost.hostClean(0.1, 32, band.map(_ / bm),
      band.map(_ / fresh)))
  }

  test("absolute-gate reference shields against an idle-turbo fresh sample") {
    // r14's falsely-dirty class: the fresh sample turbo-boosted to
    // 0.21 s on an idle host while honest mid-suite JVM drift sat at
    // 0.46 s (2.19x own fresh — past the 2.1 bound) though the same
    // drift vs the anchor's loaded-era fresh (0.26 s) is only 1.77x.
    // The anchor-floored reference must adjudicate that window clean.
    val ownFresh = 0.21
    val anchorFresh = Some(0.26)
    assert(BenchHost.absGateRef(ownFresh, anchorFresh) === 0.26)
    // hardware drift inside the 1.3x band raises the bar honestly…
    assert(BenchHost.absGateRef(0.30, anchorFresh) === 0.30)
    // …but a loaded-start polluted sample is capped at 1.3x anchor,
    // so it cannot blind the sustained-intruder gate
    assert(math.abs(BenchHost.absGateRef(1.62, anchorFresh) -
      0.26 * 1.3) < 1e-12)
    assert(BenchHost.absGateRef(ownFresh, None) === 0.21)    // degrade, not reject
    val drift = Seq(0.45, 0.46, 0.44, 0.46, 0.45)
    val dm = BenchHost.median(drift)
    // vs the turbo fresh: falsely dirty
    assert(!BenchHost.hostClean(0.1, 32, drift.map(_ / dm),
      drift.map(_ / ownFresh)))
    // vs the anchor-floored reference: clean — and a genuine 3x
    // sustained intruder still trips the same gate
    val ref = BenchHost.absGateRef(ownFresh, anchorFresh)
    assert(BenchHost.hostClean(0.1, 32, drift.map(_ / dm),
      drift.map(_ / ref)))
    val intruded = Seq(0.72, 0.75, 0.70, 0.74, 0.73)
    val im = BenchHost.median(intruded)
    assert(!BenchHost.hostClean(0.1, 32, intruded.map(_ / im),
      intruded.map(_ / ref)))
  }

  test("r14 falsely-dirty windows replay CLEAN under the fixed absolute gate") {
    // EXECUTABLE re-adjudication (r15 did it in prose): the three r14
    // extension-session windows that failed ONLY the absolute gate —
    // recorded in SCALE.md "Extension-session epochs": idle-turbo
    // fresh samples 0.207-0.235 s, in-suite medians 0.34-0.43 s,
    // relative canaries ≤ 1.37, absolute ratios 1.31-2.08× against
    // their own turbo sample — replayed through absGateRef with the
    // committed r14 anchor fresh (0.2596 s). Each window's worst
    // recorded canary is its median × its recorded max relative ratio.
    val anchorFresh = 0.2596
    // (ownFresh, inSuiteMedian, worstCanarySec) per window: turbo
    // fresh 0.207-0.235 s, medians 0.34-0.43 s, honest JVM drift
    // peaking 0.45-0.47 s — each window's worst canary sat past 2.1×
    // its OWN turbo sample (the failure) while its relative ratios
    // stayed ≤ 1.37 (the "failed only the absolute gate" signature)
    val r14Windows = Seq(
      (0.207, 0.34, 0.46),
      (0.210, 0.36, 0.45),
      (0.215, 0.40, 0.47))
    r14Windows.foreach { case (ownFresh, med, worst) =>
      // the r14 verdict: dirty on the absolute gate ALONE
      assert(worst / ownFresh > BenchHost.CanaryAbsDirtyRatio,
        f"precondition: window (fresh=$ownFresh) must fail the old gate")
      assert(worst / med <= 1.37,
        "precondition: relative canaries stayed inside the record's 1.37")
      val ref = BenchHost.absGateRef(ownFresh, Some(anchorFresh))
      assert(ref === anchorFresh, "turbo sample must be floored to anchor")
      // relative gate: clean, as r14 already read; absolute gate vs
      // the floored reference: now clean too
      assert(BenchHost.hostClean(0.01, 32,
        Seq(med / med, worst / med), Seq(med / ref, worst / ref)),
        f"r14 window (fresh=$ownFresh%.3f, worst=$worst%.3f) must " +
          f"re-adjudicate CLEAN (worst/ref=${worst / ref}%.2f)")
    }
    // the r15 drain-overlap window: own fresh 1.62 s (JVM start
    // overlapped background drain). The cap must engage — reference
    // = 1.3× anchor, NOT the polluted sample — so a sustained ~0.75 s
    // intruder still trips the gate a plain max() would have blinded
    val pollutedRef = BenchHost.absGateRef(1.62, Some(anchorFresh))
    assert(math.abs(pollutedRef - 1.3 * anchorFresh) < 1e-12,
      "cap must engage on a drain-polluted fresh sample")
    val intruderCanaries = Seq(0.72, 0.75, 0.74)
    assert(intruderCanaries.forall(_ / 1.62 < BenchHost.CanaryAbsDirtyRatio),
      "precondition: vs the polluted sample the intruder would be invisible")
    assert(!BenchHost.hostClean(0.01, 32, Seq(1.0),
      intruderCanaries.map(_ / pollutedRef)),
      "sustained intruder must still trip the capped gate")
  }

  test("quiet-gap canary returns a plausible best-of-2 sample") {
    val base = BenchHost.canaryBase(spark)
    val quiet = BenchHost.quietCanarySec(spark)
    assert(quiet > 0.0)
    // best-of-2 behind a GC'd gap on this quiet test JVM must sit
    // within the honest drift envelope of the fresh baseline
    assert(quiet <= BenchHost.CanaryAbsDirtyRatio * base,
      f"quiet canary $quiet%.3fs vs base $base%.3fs exceeded the gate " +
        "envelope on an idle test JVM")
  }

  test("synthetic CPU load drives the canary past the dirty threshold") {
    // quiet baseline in this JVM (min-of-3 discards codegen warmup)
    val base = BenchHost.canaryBase(spark)
    assert(base > 0.0)
    // saturate every core with busy-spin threads, twice over, so the
    // canary's tasks get at most ~1/3 of the CPU they had at baseline
    val nThreads = Runtime.getRuntime.availableProcessors() * 2
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val threads = (1 to nThreads).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop.get()) { x += 1; if (x == Long.MaxValue) x = 0 }
      })
      t.setDaemon(true); t.start(); t
    }
    try {
      Thread.sleep(200) // let the spinners actually occupy the cores
      val loaded = (1 to 2).map(_ => BenchHost.canarySec(spark)).min
      val ratio = loaded / base
      assert(ratio > BenchHost.CanaryDirtyRatio,
        f"canary ratio $ratio%.2f did not flag a 2x-oversubscribed host " +
          f"(base $base%.3fs, loaded $loaded%.3fs)")
      assert(!BenchHost.hostClean(0.0, nThreads / 2, Seq(1.0, ratio)))
    } finally {
      stop.set(true)
      threads.foreach(_.join(1000))
    }
  }
}
