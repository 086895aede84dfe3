package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for a training-data pipeline: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Everything is expression-
  * based (whole-stage codegen, no UDFs) and shuffle-disciplined:
  *
  *  - exact dedup: one hash-aggregate shuffle on the fingerprint;
  *  - MinHash LSH: signatures are a narrow map stage; candidate
  *    generation shuffles once per band on (band, key) — at 100 TB each
  *    band bucket is tiny (only near-dups collide), so the join is
  *    skew-safe without salting;
  *  - n-gram Jaccard: pairwise comparison ONLY within blocking buckets,
  *    never a global cross join.
  *
  * All hash constants are single-sourced here; oracle SQL is generated
  * from the same constants (see queries.Inventory) so Spark and DuckDB
  * compute identical signatures.
  */
object Dedup {

  /** Mersenne prime 2^31-1: universal-hash modulus; keeps a*x+b within
    * int64 (a,x < 2^31 → a*x < 2^62).
    */
  val P: Long = 2147483647L

  /** Fixed (a,b) pairs for the 16 minhash permutations h_i(x)=(a*x+b)%P.
    * Odd multipliers, deterministically chosen.
    */
  val minhashCoeffs: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (1234567891L, 987654321L), (1664525L, 1013904223L),
    (22695477L, 1L), (69069L, 362437L), (1103515247L, 54321L),
    (134775813L, 1L), (214013L, 2531011L), (16807L, 0L),
    (48271L, 11L), (69621L, 23L), (40692L, 37L),
    (40014L, 53L), (1583458089L, 71L), (784588716L, 97L),
    (577874365L, 131L))

  /** Bands × rows for LSH bucketing: 4 bands of 4 rows over the
    * 16-element signature → catches pairs with Jaccard ≳ 0.5.
    */
  val bands = 4
  val rowsPerBand = 4

  /** Word w-shingles of the whitespace token stream, distinct,
    * hashed to 31-bit ints.
    *
    * Two hash flavors: the default md5-based [[TextAnalysis.hash60]] is
    * PORTABLE (DuckDB can reproduce it — the oracle gate depends on
    * that); `fast = true` switches to Spark-native xxHash64, the
    * production choice at scale (several × cheaper per shingle, not
    * reproducible outside Spark). Same banding behavior either way.
    */
  def shingleHashes(text: Column, w: Int = 3, fast: Boolean = false): Column = {
    if (!fast)
      // native codegen'd kernel (graft.functions.ShingleHashes):
      // bit-identical to the builtin pipeline below but ~5× cheaper —
      // higher-order functions evaluate their lambdas interpreted,
      // paying expression dispatch per shingle element
      return graft.functions.TextHashes.shingle_hashes(text, w, P)
    val h: Column => Column = g => pmod(xxhash64(g), lit(P))
    // Let-bind the token array as a lambda variable (single-element
    // transform): inside the shingle lambda, `t` is an attribute-like
    // NamedLambdaVariable, so the 3 element_at accesses per shingle
    // read the bound array instead of re-evaluating the tokenizer
    // expression per access (observed 4× slowdown without this).
    element_at(
      transform(array(TextAnalysis.tokens(text)), t =>
        array_distinct(transform(
          // guard: for texts with fewer than w tokens the unguarded
          // sequence(1, size-w+1) is sequence(1,0) — a DESCENDING [1,0]
          // in Spark — and element_at(t,0) throws; short texts must
          // instead yield the empty shingle set (as the oracle's
          // range(1, n+1) does)
          when(size(t) >= w, sequence(lit(1), size(t) - (w - 1)))
            .otherwise(array().cast(ArrayType(IntegerType))),
          i => h(concat_ws(" ", (0 until w).map(o => element_at(t, i + o)): _*))))),
      1)
  }

  /** 16-element MinHash signature over the shingle hashes; NULL-element
    * free (empty shingle set → signature of P, a sentinel no real hash
    * reaches).
    *
    * Computed as ONE left-fold over the shingle list updating all 16
    * mins at once, not 16 independent array_min(transform(...)) scans:
    * Catalyst's CollapseProject inlines a staged shingle column into
    * every element of a 16-element array constructor, so the
    * per-element form recomputes the whole md5 shingle pipeline 16×
    * per row (observed 11s vs 1.5s at sf0.1). The fold references the
    * shingle list exactly once, making it inline-proof. min is
    * order-insensitive → result identical to the per-element form and
    * to the DuckDB oracle.
    */
  def minhashSignature(shingles: Column): Column =
    // native codegen'd kernel (graft.functions.MinHashSig): one tight
    // loop updating all 16 mins per shingle — same values as the
    // single-left-fold builtin form it replaces (min is order-
    // insensitive), without the interpreted per-element fold that
    // allocated a fresh 16-array per shingle
    graft.functions.TextHashes.minhash_sig(shingles, minhashCoeffs, P)

  /** LSH band keys: one string key per band, formed from that band's
    * signature slice. Docs sharing any band key are candidates.
    */
  def bandKeys(sig: Column): Column =
    array((0 until bands).map { b =>
      concat_ws("_", lit(b.toString) +:
        (1 to rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r)): _*)
    }: _*)

  /** Exact dedup: group by normalized-content fingerprint; emit one
    * representative (min id) + duplicate count per content group.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprintHex(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Persisted (id, sig) MinHash signature frame of a corpus.
    *
    * STAGED projections, not one nested expression: inlining
    * bandKeys(minhashSignature(shingleHashes(…))) would make Catalyst
    * re-expand the shingle hashing once per signature element and the
    * signature once per band element — a 256× expression blowup
    * (observed 309s → ~3s at sf0.1). Column references across Project
    * nodes are evaluated once; CollapseProject keeps non-cheap exprs
    * referenced more than once staged.
    * widen BEFORE the md5+permutation map: a single-split input would
    * otherwise run the whole signature pipeline on one core.
    * persist the SIGNATURES (narrow: id + 16 longs), not the exploded
    * buckets — joins recompute the cheap band-key explode from the
    * cached sigs on each side instead of storing 'bands' copies of
    * every row, and the join partitioning is left to AQE: band buckets
    * are tiny by construction (only near-dups collide), so AQE
    * coalesces the shuffle at small scale and splits skew at large
    * scale (an explicit repartition here cost 2-4× at sf0.1).
    */
  /** The ONE canonical widen → shingle → signature staging chain —
    * every signature consumer (one-shot candidates, cross-corpus
    * probes, the persisted incremental band index) must build on this
    * so a tweak to shingling or staging discipline lands everywhere
    * at once. Output: (id, sig), NOT cached — callers that fan the
    * frame into multiple consumers wrap it in [[stagedSignatures]].
    */
  private[graft] def signatureFrame(df: DataFrame, idCol: String,
      textCol: String, w: Int, fast: Boolean = false): DataFrame =
    graft.ops.Parallelism.widen(df)
      .select(col(idCol).as("id"), shingleHashes(col(textCol), w, fast).as("grams"))
      .select(col("id"), minhashSignature(col("grams")).as("sig"))

  private def stagedSignatures(df: DataFrame, idCol: String, textCol: String,
      w: Int, fast: Boolean): DataFrame =
    graft.CacheRegistry.register(
      signatureFrame(df, idCol, textCol, w, fast)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** MinHash LSH candidate pairs: explode band keys, self-join within
    * buckets, dedup (a<b), then score by signature agreement.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, fast: Boolean = false): DataFrame = {
    val sigs = stagedSignatures(df, idCol, textCol, w, fast)
    val buckets = sigs
      .select(col("id"), col("sig"), explode(bandKeys(col("sig"))).as("bucket"))
    val a = buckets.select(col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = buckets.select(col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          bool => bool)).cast(DoubleType) / minhashCoeffs.size)
          .as("sig_agreement"))
      .distinct()
  }

  /** 60-bit SimHash (the full width of [[TextAnalysis.hash60]]): bit k
    * of the fingerprint is set when the +1/-1 vote sum over tokens'
    * k-th hash bits is positive.
    *
    * 60 bits, not 32: band-blocked candidate generation partitions the
    * fingerprint into `maxHamming+1` bands, and the band VALUE SPACE is
    * what bounds bucket occupancy at scale — 15-bit bands give 32,768
    * values where the old 32-bit layout's 8-bit bands gave 256 (N/256
    * docs per bucket from random collisions alone → O(N²/256) pairs at
    * corpus scale; the Manku-et-al. wide-band layout removes that).
    */
  val simhashBits = 60

  /** Native codegen'd kernel (graft.functions.SimHashExpr) — identical
    * values to [[simhashComposed]], the builtin higher-order-function
    * fold it replaces (vote sums are order-insensitive; TextHashesSpec
    * proves bit-equality), at a fraction of the interpreted-fold cost.
    */
  def simhash(text: Column): Column =
    graft.functions.TextHashes.sim_hash(text, simhashBits)

  /** Builtin-composed twin of [[simhash]]: single fold over the token
    * hashes maintaining all vote counters at once (same inline-proofing
    * rationale as [[minhashSignature]] — the per-bit form recomputes
    * the token-hash pipeline once per bit). Kept as the spec
    * cross-check for the native kernel.
    */
  private[graft] def simhashComposed(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(text), t => TextAnalysis.hash60(t))
    // bit-k test via a literal mask array (shift functions need a
    // static Int, but the fold index is a Column)
    val mask = array((0 until simhashBits).map(k => lit(1L << k)): _*)
    val idx = array((0 until simhashBits).map(k => lit(k)): _*)
    val init = array(Seq.fill(simhashBits)(lit(0L)): _*)
    val votes = aggregate(hashes, init, (acc, h) =>
      zip_with(acc, idx, (v, k) =>
        v + when(h.bitwiseAND(element_at(mask, k + 1)) =!= 0, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, idx, (v, k) =>
        when(v > 0, element_at(mask, k + 1)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Pigeonhole band layout: (shift, width) per band — `maxHamming+1`
    * bands tiling the fingerprint, last band absorbing the remainder.
    * Shared with the oracle-SQL generator so both engines bucket
    * identically.
    */
  def simhashBandLayout(maxHamming: Int): Seq[(Int, Int)] = {
    val nBands = maxHamming + 1
    require(nBands <= simhashBits, s"need at least 1 bit per band")
    val base = simhashBits / nBands
    (0 until nBands).map { b =>
      val shift = b * base
      (shift, if (b == nBands - 1) simhashBits - shift else base)
    }
  }

  /** SimHash near-dup candidate pairs: pairs of docs whose SimHash
    * fingerprints differ in at most `maxHamming` bits.
    * Blocking is the pigeonhole band trick: split the fingerprint into
    * `maxHamming + 1` bands — any pair within the hamming budget must
    * agree EXACTLY on at least one band — so candidates come from
    * equi-joins on band values, never a global cross join, and the
    * exact bit_count(xor) filter runs only inside buckets. With 60-bit
    * fingerprints and maxHamming=3 each band spans 15 bits, so random
    * (non-near-dup) band collisions are 1 in 32,768 — bucket occupancy
    * stays bounded at corpus scale.
    */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val layout = simhashBandLayout(maxHamming)
    val sh = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val banded = sh.select(col("id"), col("sh"),
      explode(array(layout.zipWithIndex.map { case ((shift, width), b) =>
        concat_ws("_", lit(b),
          shiftright(col("sh"), shift)
            .bitwiseAND(lit((1L << width) - 1)))
      }: _*)).as("bucket"))
    val a = banded.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Wide-key pigeonhole layout for [[simhashCandidatesScaled]]:
    * `maxHamming + 2` bands tiling the fingerprint (one MORE than the
    * minimum), last band absorbing the remainder.
    */
  def simhashPairBandLayout(maxHamming: Int): Seq[(Int, Int)] = {
    val nBands = maxHamming + 2
    require(nBands <= simhashBits, s"need at least 1 bit per band")
    val base = simhashBits / nBands
    (0 until nBands).map { b =>
      val shift = b * base
      (shift, if (b == nBands - 1) simhashBits - shift else base)
    }
  }

  /** SimHash near-dup candidates via COMPOUND pair-band keys — the
    * corpus-scale variant of [[simhashCandidates]], same exact output
    * (every hamming ≤ `maxHamming` pair, no false negatives), with
    * bucket occupancy divided by ~2^12 relative to the single-band
    * layout.
    *
    * Pigeonhole, one band deeper (the multi-block idea of Manku et
    * al., WWW'07 §3): with `maxHamming + 2` bands, a pair within the
    * hamming budget flips bits in at most `maxHamming` bands, leaving
    * at least TWO bands untouched — so the pair agrees exactly on
    * some unordered PAIR of bands and an equi-join on all
    * C(maxHamming+2, 2) compound keys (band indices + both values)
    * finds it. For 60-bit fingerprints at maxHamming = 3: 5 bands of
    * 12 bits → 10 keys per doc with 24-bit values, so random
    * collisions fall 1 in 2^24 vs the single-band layout's 1 in 2^15.
    * Why it matters: the band join is CORPUS × CORPUS, the shape
    * whose Σ occupancy² work a static key space turns quadratic
    * (SCALE.md knob audit) — single 15-bit bands keep N²/2^15 random
    * pairs bounded to ~10⁷ docs, compound 24-bit keys push the same
    * knee past ~10⁹ docs for one extra explode row per true pair and
    * 2.5× the explode volume. Both layouts verify candidates with the
    * exact bit_count(xor) filter, so precision is unaffected; the
    * equality of the two paths' OUTPUT is the q_simhash_scaled gate
    * (its oracle replays the independent single-band derivation).
    */
  def simhashCandidatesScaled(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val layout = simhashPairBandLayout(maxHamming)
    val sh = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def bandVal(shift: Int, width: Int) =
      shiftright(col("sh"), shift).bitwiseAND(lit((1L << width) - 1))
    val keys = for {
      i <- layout.indices; j <- layout.indices if i < j
    } yield concat_ws("_", lit(i), lit(j),
      bandVal(layout(i)._1, layout(i)._2), bandVal(layout(j)._1, layout(j)._2))
    val banded = sh.select(col("id"), col("sh"),
      explode(array(keys: _*)).as("bucket"))
    val a = banded.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Apply near-dedup: keep one representative per near-dup group by
    * greedily dropping the higher id of every confident candidate pair
    * (the standard LSH-dedup policy; transitive clusters collapse to
    * their min id over one pass for pairs found within bands).
    *
    * EXACT-DEDUP-FIRST: the corpus is collapsed to one min-id
    * representative per content fingerprint BEFORE LSH candidate
    * generation. A K-copy exact-duplicate cluster (ubiquitous
    * boilerplate at corpus scale — K can be 10⁵-10⁷) shares every band
    * key, so running LSH on the raw corpus emits K²/2 candidate pairs
    * per band; after the exact pre-pass the cluster contributes exactly
    * one row to every bucket. For byte-identical copies the kept set is
    * unchanged (identical signatures → agreement 1.0 ≥ any threshold,
    * so the raw pipeline dropped every non-min copy anyway, and a
    * dropped representative's dropping partner is represented in the
    * same buckets). The fingerprint is [[exact]]'s NORMALIZED one, so
    * case/whitespace variants also collapse — a deliberate strict
    * superset of the raw pipeline's drops, mirrored in the oracle.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      minAgreement: Double = 0.75, fast: Boolean = false): DataFrame = {
    // representative rows in ONE aggregation: min_by(full row, id) per
    // normalized fingerprint is the same row set as the old
    // exact()+left_semi pair (min id per content group, ids unique by
    // contract) but evaluates the upstream of df — often an expensive
    // gate, e.g. the corpus pipeline's lang+quality filter — ONCE
    // instead of twice, and replaces an agg+join with a single agg.
    // Persisted: reps feed both signature generation and the final
    // anti-join base.
    val reps = graft.CacheRegistry.register(
      df.groupBy(TextAnalysis.fingerprintHex(col(textCol)).as("__fp"))
        .agg(min_by(struct(df.columns.map(col).toIndexedSeq: _*),
          col(idCol)).as("__rep"))
        .select(col("__rep.*"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val drops = minhashCandidates(reps, idCol, textCol, fast = fast)
      .filter(col("sig_agreement") >= minAgreement)
      .select(col("id_b").as(idCol)).distinct()
    reps.join(drops, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-duplicate pairs: semantic dedup over an
    * embedding column (array<float>), LSH-blocked so candidate
    * generation scales with bucket occupancy, never |corpus|².
    *
    * Blocking = MULTI-TABLE sign-random-projection: `numTables`
    * independent hash tables, each bucketing by the sign pattern of
    * `numPlanes` deterministic hyperplanes (shared with
    * [[graft.sim.Ann]]). A pair is a candidate when it agrees on every
    * plane of AT LEAST ONE table — per-table pass probability
    * (1-θ/π)^numPlanes, OR-amplified across tables to
    * 1-(1-p)^numTables. Plane count controls bucket occupancy (the
    * scale knob: 2^numPlanes key values per table — 12 planes = 4,096
    * buckets, so random collisions put N/4096 rows in a bucket, where
    * the old single-table numPlanes=4 default's 16 buckets degenerated
    * to O(N²/16) pairwise work); table count buys back the recall that
    * more planes cost. Exact left-fold cosine (bit-exact across
    * engines) scores the survivors; pairs at or above `threshold`
    * (compared on the rounded value, so the boundary is
    * engine-agnostic) are emitted as (id_a, id_b, cos_sim).
    */
  /** Adaptive plane-count bounds for [[embeddingNearDupPairs]]: the
    * floor is the r14 scaled config (12 planes = 4,096 buckets/table,
    * chosen for recall at bench SFs); past 65k vectors the count grows
    * with the corpus (one plane per doubling, the
    * [[graft.sim.KnnGraph.seedPlanes]] integer derivation with a
    * 12-plane floor) so bucket occupancy — and with it the Σ occ²
    * pairwise work, the knn-seed failure shape — stays ~constant at
    * any SF instead of growing linearly into a quadratic join. The
    * ceiling bounds the oracle's expression size; each table draws its
    * planes from a FIXED [[EmbedMaxPlanes]]-stride block of the shared
    * hyperplane sequence so a derived count is always a PREFIX of the
    * same plane set (the masked-key discipline — the SQL computes all
    * EmbedMaxPlanes signs and substr-masks down).
    */
  val EmbedMinPlanes = 12
  val EmbedMaxPlanes = 20
  val EmbedTargetOccupancy = 16L

  /** Count-derived plane count for the embedding LSH — exact integer
    * comparisons shared with the oracle's CASE chain.
    */
  def embedPlanes(n: Long): Int =
    graft.sim.KnnGraph.seedPlanes(n, EmbedTargetOccupancy,
      EmbedMinPlanes, EmbedMaxPlanes)

  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.35, numPlanes: Int = 0, numTables: Int = 3,
      dim: Int = 64): DataFrame = {
    import graft.sim.Ann
    // numPlanes = 0 (default) derives the count from one corpus
    // count() — the q_semdedup occupancy discipline; an explicit
    // positive value pins it (synthetic fixtures)
    val p = if (numPlanes == 0) embedPlanes(df.count()) else numPlanes
    // table t draws planes [t*EmbedMaxPlanes, t*EmbedMaxPlanes + p)
    // from the shared deterministic hyperplane sequence — a fixed
    // stride, NOT t*p, so the plane set at any derived count is a
    // prefix of the same per-table block and the masked oracle
    // replays it. ALL tables' keys come from one SignBuckets kernel
    // call — the hyperplane matrix rides as a reference object
    // instead of numTables·p·dim literal nodes the optimizer would
    // re-chew every run
    val allPlanes = (0 until numTables).flatMap(t =>
      (0 until p).map(i => Ann.hyperplane(t * EmbedMaxPlanes + i, dim)))
    val tableKeyArray = graft.functions.TextHashes.sign_buckets(
      col(vecCol), allPlanes, numTables, withPrefix = true)
    // bucket keys AND norm staged once per vector in the persisted
    // projection — the pairwise stage then does a single dot fold per
    // candidate (norms per pair would triple the interpreted fold
    // work); the explode stays OUTSIDE the persisted frame so the
    // cache holds one row per vector, not numTables copies
    val keyed = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).as("id"), col(vecCol).as("vec"),
          tableKeyArray.as("buckets"),
          Ann.norm(col(vecCol)).as("nrm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      .select(col("id"), col("vec"), col("nrm"),
        explode(col("buckets")).as("bucket"))
    val a = keyed.select(col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = keyed.select(col("bucket"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Ann.cosinePre(Ann.dot(col("vec_a"), col("vec_b")),
          col("nrm_a"), col("nrm_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      // a pair agreeing in several tables surfaces once per table —
      // dedup after the (cheap, deterministic) scoring
      .distinct()
  }

  /** Duplicate CLUSTERS: every document labeled with the min doc id of
    * its transitive near-duplicate component — pairs alone under-dedup
    * (A≈B, B≈C but A̸≈C leaves two of the three after greedy pair
    * dropping picks badly), so production dedup keeps one representative
    * per CONNECTED COMPONENT of the near-dup graph.
    *
    * Pipeline: exact-first representative per normalized fingerprint
    * (same min_by shape as [[dropNearDuplicates]]) → MinHash-LSH
    * candidate edges over representatives (≥ minAgreement) →
    * [[graft.ops.ConnectedComponents]] over the rep graph → every
    * document inherits its representative's component. Exact copies
    * share a representative and therefore a cluster; documents with no
    * near-duplicate form singleton clusters labeled by their own
    * representative.
    *
    * Scale shape: the only data-sized stages are the fingerprint
    * aggregation and the banded candidate join (both shared with the
    * dedup family); the CC loop runs on the EDGE list — near-dup pairs,
    * orders of magnitude smaller than the corpus — for O(log diameter)
    * rounds.
    */
  def duplicateClusters(df: DataFrame, idCol: String, textCol: String,
      minAgreement: Double = 0.75, fast: Boolean = false): DataFrame = {
    val fp = TextAnalysis.fingerprintHex(col(textCol))
    // NOT persisted: consumed exactly once, by the final mapping join
    // (the incFp lesson from dropDuplicatesAgainst — a single-consumer
    // cache only competes for block-manager memory)
    val docFp = df.select(col(idCol), fp.as("__fp"))
    val reps = graft.CacheRegistry.register(
      df.groupBy(fp.as("__fp"))
        .agg(min(col(idCol)).as(idCol),
          min_by(col(textCol), col(idCol)).as(textCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val edges = minhashCandidates(reps, idCol, textCol, fast = fast)
      .filter(col("sig_agreement") >= minAgreement)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comps = graft.ops.ConnectedComponents.run(
      reps.select(col(idCol).as("id")), edges)
    docFp
      .join(reps.select(col("__fp"), col(idCol).as("__rep")), Seq("__fp"))
      .join(comps, col("__rep") === comps("id"))
      .select(col(idCol), col("component").as("cluster_id"))
  }

  /** SoftDedup (Xue et al. '24 — reweight, don't drop): every
    * document keeps its place in the corpus but carries sampling
    * weight 1/|near-dup cluster|, so a cluster of n copies
    * contributes ONE document's worth of expected training mass while
    * preserving the (slightly different) variants hard dedup throws
    * away. Output: (idCol, cluster_id, csize, weight) — feed `weight`
    * to [[graft.ops.Sampling.weightedSample]] /
    * [[graft.ops.Sampling.weightedSampleK]] or multiply into loss
    * weighting downstream.
    *
    * Scale shape: [[duplicateClusters]]'s machinery (the only
    * data-sized stages are the fingerprint agg and the banded join);
    * the cluster-size frame is CLUSTER-count-sized and joins back by
    * cluster id.
    */
  def softDedupWeights(df: DataFrame, idCol: String, textCol: String,
      minAgreement: Double = 0.75, fast: Boolean = false): DataFrame = {
    val clusters = duplicateClusters(df, idCol, textCol, minAgreement, fast)
    val cs = clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("csize"))
    clusters.join(cs, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("csize"),
        round(lit(1.0) / col("csize").cast(DoubleType), 6).as("weight"))
  }

  /** Cross-corpus MinHash-LSH candidate pairs: (incoming id_a,
    * reference id_b) sharing a band bucket, scored by signature
    * agreement — the two-sided variant of [[minhashCandidates]]
    * (no `id_a < id_b` ordering filter: the sides are distinct
    * corpora).
    */
  def minhashCandidatesAcross(incoming: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, w: Int = 3,
      fast: Boolean = false): DataFrame = {
    def banded(df: DataFrame, side: String) =
      stagedSignatures(df, idCol, textCol, w, fast)
        .select(col("id").as(s"id_$side"), col("sig").as(s"sig_$side"),
          explode(bandKeys(col("sig"))).as("bucket"))
    banded(incoming, "a").join(banded(reference, "b"), Seq("bucket"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          bool => bool)).cast(DoubleType) / minhashCoeffs.size)
          .as("sig_agreement"))
      .distinct()
  }

  /** Incremental dedup: drop from `incoming` every document that
    * exact- or near-duplicates a document already in `reference` —
    * the daily-ingest companion to [[dropNearDuplicates]] (which
    * dedups a corpus against itself). Duplicates WITHIN the incoming
    * batch are deliberately kept (compose [[dropNearDuplicates]] for
    * that); the reference corpus is never modified, only probed.
    *
    * Same exact-first scale discipline as [[dropNearDuplicates]]:
    * both sides collapse to one representative per normalized
    * fingerprint before banding (a K-copy boilerplate cluster on
    * either side would otherwise multiply bucket pairs), and a
    * near-dropped representative drops every incoming doc sharing its
    * fingerprint.
    */
  def dropDuplicatesAgainst(incoming: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, minAgreement: Double = 0.75,
      fast: Boolean = false): DataFrame = {
    val fp = TextAnalysis.fingerprintHex(col(textCol))
    // NOT persisted: this frame is consumed exactly once (into
    // exactSurvivors, which IS persisted and feeds every downstream
    // consumer) — caching the full incoming rows here only competed
    // for block-manager memory with the caches that matter
    val incFp = incoming.withColumn("__fp", fp)
    // ONE cached fingerprint aggregation of the reference serves both
    // exact stages: its fp column is already distinct (it's the groupBy
    // key) and min_by carries the representative's id AND text, so the
    // reference corpus is scanned — and its normalize+md5 map, the
    // expensive stage at 100 TB, evaluated — exactly once, where the
    // old shape paid a distinct-fp scan, a second fingerprint scan
    // inside exact(), and a join back for the rep text.
    val refExact = graft.CacheRegistry.register(
      reference.groupBy(fp.as("__fp"))
        .agg(min(col(idCol)).as(idCol),
          min_by(col(textCol), col(idCol)).as(textCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // exact stage: any incoming doc whose fingerprint exists in the
    // reference is a duplicate — anti-join on the fp.
    // exactSurvivors is PERSISTED: it feeds the rep build, the fp
    // drop-mapping, and the final anti-join — without the cache the
    // incoming fingerprint scan + anti-join would re-run per consumer
    // (same discipline as dropNearDuplicates' reps cache)
    val exactSurvivors = graft.CacheRegistry.register(
      incFp.join(refExact.select(col("__fp")), Seq("__fp"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // near stage over representatives only — same one-agg min_by shape.
    // The incoming side is keyed by its FINGERPRINT (not the doc id):
    // candidate pairs then come back already fp-keyed, so the dropped
    // fingerprints fall straight out of the candidate scores — no join
    // back to the rep frame (and no second groupBy over the survivors
    // to rebuild it) before the final anti-join.
    val incReps = exactSurvivors
      .groupBy(col("__fp"))
      .agg(min_by(col(textCol), col(idCol)).as(textCol))
      .select(col("__fp").as(idCol), col(textCol))
    val refReps = refExact.select(col(idCol), col(textCol))
    val dropFps = minhashCandidatesAcross(incReps, refReps, idCol, textCol,
      fast = fast)
      .filter(col("sig_agreement") >= minAgreement)
      .select(col("id_a").as("__fp")).distinct()
    exactSurvivors.join(dropFps, Seq("__fp"), "left_anti").drop("__fp")
  }

  /** Benchmark decontamination report: for every corpus document
    * sharing at least one word w-shingle with the benchmark set, the
    * count of distinct shared shingles — the standard eval-leakage
    * check run before training (13-gram overlap in the common recipe;
    * w is the knob).
    *
    * Scale shape: the benchmark's distinct shingle-hash set is small
    * (eval suites are, even when the corpus is 100 TB) and BROADCAST;
    * the corpus side is one narrow map (native shingle kernel) +
    * explode + broadcast-hash semi-join + count — no shuffle of corpus
    * text, no pairwise work. The caller guarantees the benchmark side
    * fits a broadcast (require a sane bound upstream if unsure).
    */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, w: Int = 5,
      fast: Boolean = false): DataFrame = {
    val bh = benchmark
      .select(explode(shingleHashes(col(textCol), w, fast)).as("h"))
      .distinct()
    // shingleHashes is distinct-within-doc, so count(*) after the join
    // IS the distinct shared-shingle count per document
    graft.ops.Parallelism.widen(corpus)
      .select(col(idCol), explode(shingleHashes(col(textCol), w, fast)).as("h"))
      .join(broadcast(bh), Seq("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-document duplicated-span profile — the exact-substring-dedup
    * signal: for each document, how many of its distinct w-token spans
    * also occur in at least `minDocs` documents overall (itself
    * included). A high `dup_frac` marks boilerplate-heavy documents
    * that span-level dedup would trim; it is the CROSS-document
    * complement of `repetitionRatio`'s within-document signal.
    *
    * Scale shape: spans are distinct-within-doc hashed shingles, so
    * the span-frequency table needs one partial-aggregated shuffle
    * (count per span hash IS its document frequency — k·docs rows in,
    * heavy hitters collapse map-side); the join back is a plain
    * equi-join on the hash with fan-out 1 per span occurrence, so
    * nothing is quadratic even for a span shared by 10⁷ documents.
    * Docs too short to have any w-token span survive with zero counts
    * (left join at the end).
    */
  def spanProfile(df: DataFrame, idCol: String, textCol: String,
      w: Int = 6, minDocs: Int = 2, fast: Boolean = false): DataFrame = {
    val spans = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).as("id"),
          explode(shingleHashes(col(textCol), w, fast)).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val freq = spans.groupBy(col("h")).agg(count(lit(1)).as("nd"))
    val perDoc = spans.join(freq, Seq("h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("nd") >= minDocs, 1L).otherwise(0L)).as("n_dup"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        round(when(col("n_spans") > 0,
          col("n_dup").cast(DoubleType) / col("n_spans"))
          .otherwise(0.0), 6).as("dup_frac"))
  }

  /** Duplicated-span SCRUB — the rewrite complement of [[spanProfile]]:
    * remove every token covered by a w-token span that occurs in at
    * least `minDocs` documents (boilerplate removal à la C4/RefinedWeb
    * line-dedup, over spans since the corpus carries no line
    * structure), and reconstruct the cleaned text from the surviving
    * tokens in order. Output: (idCol, text_clean, n_kept, n_dropped).
    *
    * Span document-frequency uses the same per-doc-distinct definition
    * as [[spanProfile]], so the two operators agree on what counts as
    * duplicated. Scale shape: positional w-gram hashes are a narrow
    * projection; document frequency is one partial-aggregated shuffle
    * on the hash; covered positions fan out ≤ w rows per duplicated
    * span occurrence; the rebuild is one groupBy(id) with an in-group
    * sort — nothing quadratic, no driver-side data. Documents whose
    * every token is covered survive with empty text (left join back).
    */
  def scrubDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int = 6, minDocs: Int = 2): DataFrame = {
    import graft.text.TextAnalysis
    val base = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // positional span hashes: entry at 0-based pos i covers toks[i, i+w)
    val gramArr = when(size(col("toks")) >= w,
      transform(sequence(lit(0), size(col("toks")) - w),
        i => TextAnalysis.hash60(
          concat_ws(" ", slice(col("toks"), i + 1, lit(w)))) % P))
      .otherwise(array().cast(ArrayType(LongType)))
    val spans = base.select(col("id"), posexplode(gramArr).as(Seq("pos", "h")))
    val dup = spans.select(col("id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    val covered = spans.join(dup, Seq("h"))
      .select(col("id"), explode(sequence(col("pos"), col("pos") + (w - 1))).as("p"))
      .distinct()
    val kept = base
      .select(col("id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .join(covered, Seq("id", "p"), "left_anti")
      .groupBy(col("id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            s => s.getField("tok")),
          " ").as("text_clean"),
        count(lit(1)).as("n_kept"))
    base.select(col("id"), size(col("toks")).cast(LongType).as("__n"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** n-gram Jaccard near-dup pairs within blocking buckets (never a
    * global cross join — the blocking key bounds pair count at scale).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], w: Int = 3, threshold: Double = 0.2,
      fast: Boolean = false): DataFrame = {
    // Blocking bounds the pair count; near-dups that straddle a block
    // boundary are missed by design — callers trade recall for scale
    // via their blocking key (length buckets, source, LSH bands…).
    // explicit repartition: exempt from AQE small-shuffle coalescing,
    // which would otherwise serialize the expensive pairwise stage
    val par = df.sparkSession.sparkContext.defaultParallelism * 2
    // repartition by the blocking key BEFORE computing shingles: it
    // both parallelizes the expensive map over every core (a one-split
    // input would run it serially) and pre-shuffles for the self-join
    val withSets = graft.CacheRegistry.register(df
      .repartition(par, blockCols.map(col): _*)
      .select(
        (col(idCol).as("id") +: blockCols.map(col)) :+
          shingleHashes(col(textCol), w, fast).as("grams"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = withSets.toDF(("id_a" +: blockCols) :+ "grams_a": _*)
    val b = withSets.toDF(("id_b" +: blockCols) :+ "grams_b": _*)
    // |A∪B| = |A|+|B|-|A∩B| (sets are distinct by construction):
    // one staged intersection instead of intersect + union per pair
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("grams_a"), col("grams_b"),
        size(array_intersect(col("grams_a"), col("grams_b"))).as("inter"))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast(DoubleType) /
          (size(col("grams_a")) + size(col("grams_b")) - col("inter"))
            .cast(DoubleType), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Directional containment pairs (Broder's containment, the
    * asymmetric near-dup family): C(src ⊆ dst) = |S(src) ∩ S(dst)| /
    * |S(src)| over distinct word w-shingles. Jaccard misses the
    * quote/aggregator case — a 50-token doc wholly embedded in a
    * 5,000-token page has J ≈ 0.01 but containment 1.0 — so this is
    * the signal that catches "small doc swallowed by big doc".
    *
    * Scale shape: an INVERTED-INDEX join, not a blocked all-pairs —
    * per-shingle posting lists, DF-CAPPED at `dfCap` (a shingle shared
    * by more than dfCap docs is boilerplate carrying no containment
    * signal; dropping it bounds the self-join at Σ df² ≤ dfCap·Σ df —
    * the winnow/decontamination discipline). The denominator |S(src)|
    * counts the doc's shingles that survive the cap (including df = 1
    * singletons), so the ratio stays honest for boilerplate-heavy
    * docs: the estimator is containment OVER THE INFORMATIVE SHINGLE
    * SET, replayed exactly by the oracle.
    *
    * Output: (src_id, dst_id, shared, n_src, n_dst, contain) for
    * ordered pairs with contain ≥ minContain — both directions can
    * appear, each with its own denominator; n_dst rides along so a
    * consumer scrubbing "the swallowed copy" can break MUTUAL
    * containment (near-identical docs contain each other)
    * deterministically instead of dropping both.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, minContain: Double = 0.5, dfCap: Int = 64): DataFrame = {
    require(minContain > 0.0 && minContain <= 1.0, "minContain in (0, 1]")
    require(dfCap >= 2, "dfCap < 2 admits no shared shingle at all")
    // Postings persisted hash(h) at pinned width (the widen still runs
    // first so the shingle hashing itself is computed on every core,
    // as the map side of the hash exchange): the df count, the
    // survivor join and the posting-list self-join below all key on h,
    // so the cached layout is consumed in place three times — the
    // (id, h) rows are 16 bytes, so the one build exchange is far
    // cheaper than the three h-keyed exchanges it replaces.
    val e = graft.CacheRegistry.register(
      graft.ops.Parallelism.hashBy(
        graft.ops.Parallelism.widen(df)
          .select(col(idCol).as("id"),
            explode(shingleHashes(col(textCol), w)).as("h")),
        col("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfreq = e.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val surv = e.join(dfreq.filter(col("df") <= dfCap), Seq("h"))
    val nSrc = surv.groupBy(col("id")).agg(count(lit(1)).as("n_src"))
    // df = 1 shingles cannot produce a pair — keep them out of the
    // self-join (they only count in the denominator above)
    val posts = surv.filter(col("df") >= 2).select(col("h"), col("id"))
    val shared = posts.select(col("h"), col("id").as("src_id"))
      .join(posts.select(col("h"), col("id").as("dst_id")), Seq("h"))
      .filter(col("src_id") =!= col("dst_id"))
      .groupBy(col("src_id"), col("dst_id"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(nSrc.select(col("id").as("src_id"), col("n_src")), Seq("src_id"))
      .join(nSrc.select(col("id").as("dst_id"), col("n_src").as("n_dst")),
        Seq("dst_id"))
      .withColumn("contain",
        round(col("shared").cast(DoubleType) / col("n_src").cast(DoubleType), 6))
      .filter(col("contain") >= minContain)
      .select(col("src_id"), col("dst_id"), col("shared"), col("n_src"),
        col("n_dst"), col("contain"))
  }
}
