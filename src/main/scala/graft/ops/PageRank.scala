package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-iteration PageRank over an edge list — the entity-centrality
  * signal of a curation pipeline (rank sources/domains by how much the
  * interaction graph points at them; the weight then feeds
  * quality-weighted sampling the same way a DSIR or LM score does).
  *
  * Determinism (the usual float PageRank is order-dependent and would
  * never hash-match another engine): ranks live in QUANTIZED integer
  * units (1e9 = rank 1.0). Each iteration is
  *   r'(v) = round((1−d)·Scale) + round(d · Σ_{u→v} (r(u) div outdeg(u)))
  * where `div` is exact integer division and the Σ is an exact integer
  * sum — the only float op is one multiply-round per node per
  * iteration, identical in any engine. Long bounds: total rank mass is
  * N·Scale ≤ 2^53 for corpora to ~9×10⁶ nodes at this Scale; lower
  * Scale for bigger graphs.
  *
  * Dangling nodes (no out-edges) leak their damped mass — the common
  * simplified variant; ranks still order by in-link mass, they just
  * don't sum to N. Document-level note, not a correctness caveat.
  *
  * Scale shape: outdegree is one partial-aggregated shuffle; each of
  * the `iters` (FIXED, data-independent — no driver-side convergence
  * loop) iterations is one equi-join of the rank table against the
  * edge list keyed by src plus one partial-aggregated sum keyed by
  * dst. The edge list is persisted once and reused; plan depth is
  * static so no lineage truncation is needed (at iters ≳ 20 insert a
  * localCheckpoint every ~10 rounds, the ConnectedComponents
  * discipline).
  */
object PageRank {

  /** Quantization: integer rank units per 1.0 of rank. */
  val Scale = 1000000000L

  /** Ranks after `iters` damped iterations: (id, rank) with rank in
    * 1.0-units rounded to 1e-6. `nodes` must carry every vertex
    * (isolated ones included) in column `id`; `edges` are directed
    * (src, dst) rows, multi-edges counted with multiplicity.
    */
  def run(nodes: DataFrame, edges: DataFrame, damping: Double = 0.85,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // hash(src)-partitioned cache (Parallelism.hashBy): every
    // iteration's rank join needs ClusteredDistribution(src), so the
    // pinned layout is consumed in place `iters` times — one build
    // exchange, zero per-iteration ones on the E-sized side.
    val e = graft.CacheRegistry.register(
      Parallelism.hashBy(edges.join(deg, Seq("src")), col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val base = Math.round((1.0 - damping) * Scale)
    // every iteration right-joins the vertex set (and the caller's
    // vertex frame is typically a distinct = a shuffle): persist it
    // once instead of recomputing it iters+1 times
    val v = graft.CacheRegistry.register(
      nodes.select(col("id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var ranks = v.select(col("id"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      val sums = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = v
        .join(sums, v("id") === sums("dst"), "left")
        .select(col("id"),
          (lit(base) +
            round(lit(damping) * coalesce(col("s"), lit(0L)).cast(DoubleType))
              .cast(LongType)).as("r"))
    }
    ranks.select(col("id"),
      round(col("r").cast(DoubleType) / Scale, 6).as("rank"))
  }

  /** Personalized PageRank / TrustRank: identical damped iteration,
    * but ALL teleport mass lands on the `seeds` set — rank becomes
    * "distance-damped trust flowing out of the seeds" (the TrustRank
    * construction for web-corpus quality: seed a few audited domains,
    * propagate). Same quantized-integer discipline as [[run]]; the
    * seed indicator rides the persisted vertex frame so each
    * iteration stays one join + one partial-aggregated sum. Non-seed
    * vertices start at 0 and receive only propagated mass, so
    * unreachable-from-seeds vertices finish at exactly 0.
    *
    * One discipline refinement over [[run]]: the damped multiply is
    * EXACT INTEGER arithmetic — (num·s + den/2) div den with
    * damping = num/den — instead of round(d·double(s)). The float
    * form is correctly rounded in both engines but lands ON the .5
    * boundary whenever 17s ≡ 10 (mod 20), where the engines' round
    * paths (BigDecimal HALF_UP vs std::round of the same double) can
    * disagree by one unit; the sf1 probe caught exactly 2 such rows
    * in 200k. Integer half-up has no boundary ambiguity. `damping`
    * must therefore be a multiple of 0.01 (den = 100).
    */
  def personalized(nodes: DataFrame, seeds: DataFrame, edges: DataFrame,
      damping: Double = 0.85, iters: Int = 5): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val num = Math.round(damping * 100)
    require(num / 100.0 == damping, s"damping must be a multiple of 0.01")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // hash(src)-partitioned cache (Parallelism.hashBy): every
    // iteration's rank join needs ClusteredDistribution(src), so the
    // pinned layout is consumed in place `iters` times — one build
    // exchange, zero per-iteration ones on the E-sized side.
    val e = graft.CacheRegistry.register(
      Parallelism.hashBy(edges.join(deg, Seq("src")), col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val base = Math.round((1.0 - damping) * Scale)
    val v = graft.CacheRegistry.register(
      nodes.select(col("id"))
        .join(seeds.select(col("id")).distinct()
          .select(col("id"), lit(1L).as("is_seed")), Seq("id"), "left")
        .select(col("id"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var ranks = v.select(col("id"), (col("is_seed") * Scale).as("r"))
    for (_ <- 1 to iters) {
      val sums = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = v
        .join(sums, v("id") === sums("dst"), "left")
        .select(col("id"),
          (col("is_seed") * base +
            expr(s"(($num * coalesce(s, CAST(0 AS BIGINT))) + 50) div 100"))
            .as("r"))
    }
    // output discipline: truncate the nano-unit rank to micro-units
    // IN INTEGER SPACE, then one exact-integer→double division — a
    // round(r/1e9, 6) here can land exactly on a half boundary
    // (r ≡ 500 mod 1000), where the engines' decimal-rounding paths
    // disagree on the same double (2 rows in 200k at sf1)
    ranks.select(col("id"),
      (expr("r div 1000").cast(DoubleType) / 1000000.0).as("trust"))
  }
}
